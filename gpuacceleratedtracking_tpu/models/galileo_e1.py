"""Galileo E1 OS code generation — BOC(1,1) as a subcarrier-expanded code.

Fourth model family beyond the reference's `GNSSDICT`
(`/root/reference/src/GPUAcceleratedTracking.jl:39-42`, GPS L1/L5 only), and
the stress test of this framework's replica formulations: the BOC(1,1)
subcarrier flips sign MID-CHIP, doubling the transition density the
transition/rows bank kernels must reconstruct per 128-lane row.

TPU-first representation: the subcarrier is folded into the code table at
build time. A BOC(1,1) chip ``c`` becomes the half-chip pair ``(+c, -c)``,
so the framework sees an ordinary +/-1 code of length ``2 * 4092 = 8184``
at ``2 * 1.023 = 2.046`` Mchip/s with a 4 ms period — exactly what a
texture/memory fetch would read anyway, and every existing kernel
(transition, rows, comp, fused) works unchanged, with `num_j`/window
geometry automatically accounting for the doubled boundary rate. Phase
units throughout the framework are then HALF-chips; divide by 2 for ICD
chips.

**Code provenance.** The E1 OS primary codes are *memory codes*: 4092-bit
optimized random sequences published as hex tables in the Galileo OS SIS
ICD (Annex C), not register-generated. This environment has no network
access and no authoritative copy of those tables, so `code_table()` builds
STAND-IN primary codes with the same structure (length 4092, rate
1.023 Mchip/s, near-balance, 50 PRNs) from a documented deterministic
construction (truncated 13-stage Gold-like pairs). Every framework-level
result (kernel correctness, BOC meander handling, throughput) is
insensitive to the particular +/-1 sequence; interoperating with live
Galileo signals requires the ICD tables — load them with
`load_primary_codes()`, which accepts the ICD hex-string format and swaps
the table in.

The E1-C pilot secondary code CS25_1 (25 chips over 100 ms, shared by all
PRNs) is included as the commonly published sequence; verify against OS SIS
ICD Table 19 before live-sky use.
"""

from __future__ import annotations

import functools

import numpy as np

PRIMARY_LENGTH = 4092            # ICD chips per primary period (4 ms)
PRIMARY_FREQUENCY = 1.023e6      # ICD chips / s
CODE_LENGTH = 2 * PRIMARY_LENGTH      # half-chips after BOC(1,1) expansion
CODE_FREQUENCY = 2 * PRIMARY_FREQUENCY  # half-chips / s (2.046 Mcps)
CENTER_FREQUENCY = 1.57542e9     # Hz (shared with GPS L1)
NUM_PRNS = 50

# E1-C secondary code CS25_1 (one sign per 4 ms primary period; 100 ms
# total). Commonly published value; see provenance note above.
_CS25 = "0011100000001010110110010"


def _lfsr_bits(taps: tuple[int, ...], n_stages: int, length: int,
               init: int = 1) -> np.ndarray:
    """Fibonacci LFSR output bits (uint8), ``taps`` 1-indexed feedback stages."""
    reg = np.array([(init >> i) & 1 for i in range(n_stages)], dtype=np.uint8)
    out = np.empty(length, dtype=np.uint8)
    for i in range(length):
        out[i] = reg[-1]
        fb = 0
        for t in taps:
            fb ^= reg[t - 1]
        reg = np.concatenate(([fb], reg[:-1]))
    return out


@functools.lru_cache(maxsize=1)
def _primary_table() -> np.ndarray:
    """``[4092, 50]`` stand-in memory codes (+/-1), deterministic.

    Gold-like: two maximal 13-stage m-sequences (period 8191; primitive
    polynomials x^13+x^4+x^3+x+1 and x^13+x^12+x^11+x^8+1), the second
    circularly shifted per PRN, XORed, truncated to 4092 — the structure the
    ICD memory codes were optimized from (random-balanced, low mutual
    correlation). Replace with the ICD tables via `load_primary_codes`.
    """
    g1 = _lfsr_bits((13, 4, 3, 1), 13, 8191)
    g2 = _lfsr_bits((13, 12, 11, 8), 13, 8191)
    cols = []
    for k in range(NUM_PRNS):
        shifted = np.roll(g2, -(137 * (k + 1)))
        bits = (g1 ^ shifted)[:PRIMARY_LENGTH]
        cols.append(bits.astype(np.float32) * 2.0 - 1.0)
    return np.stack(cols, axis=1)


def _boc_expand(primary: np.ndarray) -> np.ndarray:
    """Fold the BOC(1,1) subcarrier into the table: ``c -> (+c, -c)``.

    ``[L, K] -> [2L, K]``; the meander halves are consecutive half-chips.
    """
    expanded = np.empty((2 * primary.shape[0],) + primary.shape[1:],
                        dtype=np.float32)
    expanded[0::2] = primary
    expanded[1::2] = -primary
    return expanded


@functools.lru_cache(maxsize=2)
def code_table(pilot: bool = False) -> np.ndarray:
    """``[8184, 50]`` BOC(1,1)-expanded +/-1 half-chip table.

    ``pilot=True`` selects the E1-C component (distinct stand-in sequences:
    PRN columns offset by 50 in the generator); E1-B (data) otherwise.
    """
    primary = _primary_table()
    if pilot:
        g1 = _lfsr_bits((13, 4, 3, 1), 13, 8191)
        g2 = _lfsr_bits((13, 12, 11, 8), 13, 8191)
        cols = []
        for k in range(NUM_PRNS):
            shifted = np.roll(g2, -(137 * (k + 51)))
            bits = (g1 ^ shifted)[:PRIMARY_LENGTH]
            cols.append(bits.astype(np.float32) * 2.0 - 1.0)
        primary = np.stack(cols, axis=1)
    return _boc_expand(primary)


def secondary_code() -> np.ndarray:
    """CS25 pilot overlay: ``[25]`` +/-1, one sign per 4 ms primary period."""
    return np.array([1.0 - 2.0 * int(b) for b in _CS25], dtype=np.float32)


def load_primary_codes(hex_rows, pilot: bool = False) -> np.ndarray:
    """Build the expanded table from ICD Annex C hex strings.

    ``hex_rows``: iterable of 50 hex strings, each encoding 4092 bits
    MSB-first (the ICD convention: the last hex digit carries the final 4
    bits left-aligned). Returns the ``[8184, 50]`` BOC-expanded table;
    assign it over `code_table()`'s result in a custom `GNSSSystem` to run
    with the authoritative codes.
    """
    cols = []
    for row in hex_rows:
        bits = np.array(
            [int(b) for h in row.strip() for b in f"{int(h, 16):04b}"],
            dtype=np.uint8,
        )[:PRIMARY_LENGTH]
        if bits.size != PRIMARY_LENGTH:
            raise ValueError(
                f"expected >= {PRIMARY_LENGTH} bits per row, got {bits.size}"
            )
        cols.append(bits.astype(np.float32) * 2.0 - 1.0)
    if len(cols) != NUM_PRNS:
        raise ValueError(f"expected {NUM_PRNS} rows, got {len(cols)}")
    return _boc_expand(np.stack(cols, axis=1))
