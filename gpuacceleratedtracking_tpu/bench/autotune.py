"""Tile-shape autotuner for the Pallas bank kernels.

The TPU analog of the reference's occupancy-driven launch configuration
(`launch_configuration(kernel.fun)`, `/root/reference/src/benchmarks.jl:363-374`):
where CUDA asks the driver for the occupancy-optimal block size, a Pallas
kernel's free launch parameter is its time-tile shape (``tile_rows`` — the
kernel processes ``tile_rows * 128`` samples per grid step). The optimum
trades per-step fixed cost against per-tile replica-reconstruction work and
VMEM residency, so it depends on the scenario (K, N, A, L) and the device —
we measure it once and cache it per key, exactly like the reference caches
nothing but re-queries the driver per launch.

Cache file: ``data/autotune.json`` at the repo root (git-ignorable, keyed by
device kind so CPU-interpret results never leak into TPU runs).
"""

from __future__ import annotations

import functools
import json
import pathlib
import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_TILE_ROWS = 256
DEFAULT_CHANS_PER_STEP = 1
CANDIDATES = (32, 64, 128, 256, 512)
GROUP_CANDIDATES = (1, 4, 8, 16, 32)
_BANK_FAMILY = (
    "pallas_bank", "pallas_bank_rows", "pallas_bank_comp", "pallas_bank_auto",
)
_CACHE_PATH = pathlib.Path(__file__).resolve().parents[2] / "data" / "autotune.json"


def _cache_key(
    algorithm: str, num_channels: int, num_samples: int, num_ants: int,
    num_taps: int, gnss: str,
) -> str:
    device_kind = jax.devices()[0].device_kind.replace(" ", "_")
    return (
        f"{device_kind}/{algorithm}/{gnss}"
        f"/K{num_channels}_N{num_samples}_A{num_ants}_L{num_taps}"
    )


def _load_cache(path: pathlib.Path = _CACHE_PATH) -> dict:
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def best_tile_rows(
    algorithm: str,
    num_channels: int,
    num_samples: int,
    num_ants: int = 1,
    num_taps: int = 3,
    gnss: str = "GPSL1",
    default: int = DEFAULT_TILE_ROWS,
    cache_path: pathlib.Path = _CACHE_PATH,
) -> int:
    """Cached optimal ``tile_rows`` for a scenario; ``default`` if never tuned."""
    key = _cache_key(algorithm, num_channels, num_samples, num_ants, num_taps, gnss)
    entry = _load_cache(cache_path).get(key)
    return int(entry["tile_rows"]) if entry else default


def best_launch(
    algorithm: str,
    num_channels: int,
    num_samples: int,
    num_ants: int = 1,
    num_taps: int = 3,
    gnss: str = "GPSL1",
    cache_path: pathlib.Path = _CACHE_PATH,
    on_miss: str = "warn",
) -> dict:
    """Cached optimal launch kwargs (tile_rows + chans_per_step).

    ``on_miss`` controls behavior when the scenario key is absent from the
    cache — kernel defaults can under-report a bank kernel by up to 40 %
    (CLAUDE.md), so a benchmark must never hit them silently:

    - ``"warn"`` (default): loud `warnings.warn` + kernel defaults,
    - ``"autotune"``: run `autotune_tile_rows` for the scenario, then use it,
    - ``"raise"``: `KeyError`,
    - ``"default"``: silent kernel defaults (oracle/CPU comparison cells).
    """
    key = _cache_key(algorithm, num_channels, num_samples, num_ants, num_taps, gnss)
    entry = _load_cache(cache_path).get(key)
    if not entry and on_miss == "autotune":
        autotune_tile_rows(
            algorithm, num_channels, num_samples, num_ants, num_taps, gnss,
            cache_path=cache_path,
        )
        entry = _load_cache(cache_path).get(key)
    if not entry:
        if on_miss == "raise":
            raise KeyError(
                f"no autotune cache entry for {key}; run "
                "bench.autotune.autotune_tile_rows for this scenario"
            )
        if on_miss != "default":
            import warnings

            warnings.warn(
                f"autotune cache MISS for {key}: running with kernel "
                f"defaults (tile_rows={DEFAULT_TILE_ROWS}, chans_per_step="
                f"{DEFAULT_CHANS_PER_STEP}) — launch-shape defaults cost up "
                "to 40% on bank kernels; tune via autotune_tile_rows or pass "
                "autotune_on_miss=True to the benchmark config",
                stacklevel=2,
            )
        return {
            "tile_rows": DEFAULT_TILE_ROWS,
            "chans_per_step": DEFAULT_CHANS_PER_STEP,
        }
    # A cached optimum "selected" on a clamped-to-zero measurement is noise,
    # not a tuning result (tunneled differential pairs can clamp to 0 when
    # the unroll depth is too shallow for the jitter) — refuse to trust it.
    assert float(entry.get("block_time_s", 1.0)) > 0.0, (
        f"autotune cache entry {key} has block_time_s <= 0 (noise-floored "
        "measurement); re-tune with a deeper unroll"
    )
    return {
        "tile_rows": int(entry["tile_rows"]),
        "chans_per_step": int(entry.get("chans_per_step", 1)),
    }


def autotune_tile_rows(
    algorithm: str = "pallas_bank",
    num_channels: int = 1024,
    num_samples: int = 32768,
    num_ants: int = 1,
    num_taps: int = 3,
    gnss: str = "GPSL1",
    candidates: Sequence[int] = CANDIDATES,
    groups: Sequence[int] = GROUP_CANDIDATES,
    reps: tuple[int, int] = (4, 12),
    trials: int = 7,
    cache_path: Optional[pathlib.Path] = _CACHE_PATH,
) -> int:
    """Measure block time per candidate tile shape; persist and return the best.

    Timing is differential (two unroll depths, slope estimator) so fixed
    dispatch cost cancels — see `bench.timing.benchmark_differential` for the
    rationale; the estimate per candidate is the MEDIAN of the positive
    differential samples (a min can clamp to 0 through tunnel jitter and
    elect a noise shape as "optimal"). Candidates whose geometry the kernel
    rejects (e.g. a tap span or chip rate out of range) are skipped.
    """
    from ..models import (
        EPLCorrelator, correlator_sample_shifts, gen_signal, get_system, soa,
    )
    from ..ops import registry

    system = get_system(gnss)
    fs = num_samples / 1e-3
    signal, _ = gen_signal(system, 0, 1500.0, num_samples, num_ants=num_ants)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(
        int(s)
        for s in correlator_sample_shifts(system, EPLCorrelator(num_taps), fs)
    )
    prns = jnp.arange(num_channels, dtype=jnp.int32) % codes.shape[1]
    dops = jnp.linspace(-4000.0, 4000.0, num_channels).astype(jnp.float32)
    code_freqs = jnp.full((num_channels,), system.code_frequency, jnp.float32)
    zeros = jnp.zeros(num_channels, jnp.float32)

    bank_family = algorithm in _BANK_FAMILY

    def measure(tile_rows: int, chans_per_step: int = 1) -> float:
        corr = functools.partial(
            registry.get(algorithm),
            sample_shifts=shifts,
            code_length=system.code_length,
            sampling_frequency=fs,
            tile_rows=tile_rows,
            **({"chans_per_step": chans_per_step} if bank_family else {}),
            **(
                {"nominal_code_frequency": system.code_frequency}
                if algorithm in _BANK_FAMILY
                else {}
            ),
        )

        def make(r):
            @jax.jit
            def run(offs):
                tot = jnp.float32(0.0)
                for i in range(r):
                    are, aim = corr(
                        sre, sim, codes, prns, 1500.0 + dops,
                        carrier_phase=zeros + offs[i],
                        code_frequency=code_freqs, code_phase=zeros,
                    )
                    tot = tot + are.sum() + aim.sum()
                return tot

            return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

        f1, a1 = make(reps[0])
        f2, a2 = make(reps[1])
        np.asarray(f1(*a1))
        np.asarray(f2(*a2))
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter(); np.asarray(f1(*a1)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f2(*a2)); t2 = time.perf_counter() - t0
            d = (t2 - t1) / (reps[1] - reps[0])
            if d > 0.0:
                samples.append(d)
        if not samples:
            return float("inf")        # pure noise — never elect this shape
        samples.sort()
        return samples[len(samples) // 2]

    results = {}
    for tr in candidates:
        try:
            results[(int(tr), 1)] = measure(int(tr))
        except Exception:   # geometry rejected or compile failure: skip
            continue
    results = {k: v for k, v in results.items() if v != float("inf")}
    if not results:
        raise RuntimeError("no tile_rows candidate compiled and measured > 0")
    best_tr, _ = min(results, key=results.get)
    # Second pass: channel-group batching at the winning tile shape (the
    # bank kernels share per-group work — boundary math, row phasors —
    # across the G channels of a grid step).
    if bank_family and num_channels > 1:
        for g in groups:
            if g == 1 or num_channels % g:
                continue
            try:
                t = measure(best_tr, int(g))
            except Exception:
                continue
            if t != float("inf"):
                results[(best_tr, int(g))] = t
    best_tr, best_g = min(results, key=results.get)

    if cache_path is not None:
        cache = _load_cache(cache_path)
        key = _cache_key(
            algorithm, num_channels, num_samples, num_ants, num_taps, gnss
        )
        cache[key] = {
            "tile_rows": best_tr,
            "chans_per_step": best_g,
            "block_time_s": results[(best_tr, best_g)],
            "all": {f"{k[0]}x{k[1]}": v for k, v in sorted(results.items())},
        }
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        cache_path.write_text(json.dumps(cache, indent=1, sort_keys=True))
    return best_tr
