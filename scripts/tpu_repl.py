"""Persistent TPU job runner: keeps one warm process, execs submitted snippets.

The tunneled chip pays a 1-10 min pathological warmup on the first compile of
each fresh process (CLAUDE.md "TPU access"), so experiment batches must share
one process. With no terminal multiplexer in the image, this runner provides
the persistent session: it watches a job directory and execs each ``NNN.py``
snippet in a single shared namespace (preloaded with `scripts/tpu_session.py`
helpers), writing stdout+traceback to ``NNN.out`` and renaming the job to
``NNN.done``.

    python scripts/tpu_repl.py /tmp/tpu_jobs &
    echo 'golden_check()' > /tmp/tpu_jobs/001.py
    # poll for /tmp/tpu_jobs/001.out
"""

import contextlib
import io
import pathlib
import sys
import time
import traceback

JOBS = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs")
JOBS.mkdir(parents=True, exist_ok=True)

ns: dict = {"__name__": "__tpu_repl__"}
session = pathlib.Path(__file__).with_name("tpu_session.py")
exec(compile(session.read_text(), str(session), "exec"), ns)
(JOBS / "READY").write_text("ok\n")
print("tpu_repl ready; watching", JOBS, flush=True)

while True:
    jobs = sorted(p for p in JOBS.glob("*.py"))
    if not jobs:
        if (JOBS / "STOP").exists():
            print("tpu_repl: STOP seen, exiting", flush=True)
            break
        time.sleep(0.5)
        continue
    job = jobs[0]
    out = io.StringIO()
    t0 = time.time()
    try:
        with contextlib.redirect_stdout(out), contextlib.redirect_stderr(out):
            exec(compile(job.read_text(), str(job), "exec"), ns)
        status = "ok"
    except BaseException:
        out.write(traceback.format_exc())
        status = "error"
    body = out.getvalue() + f"\n[{status} in {time.time()-t0:.1f}s]\n"
    job.with_suffix(".out").write_text(body)
    job.rename(job.with_suffix(".done"))
    print(f"ran {job.name}: {status}", flush=True)
