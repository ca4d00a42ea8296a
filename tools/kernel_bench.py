"""Pallas vs XLA kernel microbenchmarks on real TPU.

Honest accounting for the auto-dispatch defaults in `ops/fm.py` and
`ops/attention.py` (SURVEY.md §7 hard-part #4: "Pallas wins need careful
blocking or they should fall back to XLA — keep both, benchmark honestly").

    python tools/kernel_bench.py          # prints a table + writes KERNELS.md
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready returns early on the remote axon backend; a
    # one-element device->host read cannot.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_fm(rows):
    from sparrowrecsys_tpu.ops.fm import fm_cross_pallas, fm_cross_xla

    xla = jax.jit(fm_cross_xla)
    # fm_cross_pallas is a bare custom_vjp (no jit wrapper since the VJP
    # landed): calling it eagerly RE-TRACES AND RE-COMPILES EVERY CALL —
    # through the remote tunnel that measured as ~540 ms/call and poisoned
    # one KERNELS.md regeneration. Always time it under jit.
    pallas = jax.jit(fm_cross_pallas)
    # Last row set = the round-5 MFU configuration (deepfm_v2 at dim 128,
    # batch 262144, bf16 towers) — VERDICT r4 #1 demanded the dispatch
    # defaults be re-decided at the shapes that now exist.
    for b, f, d, dt in [
        (8192, 5, 64, "f32"), (8192, 32, 128, "f32"), (32768, 16, 128, "f32"),
        (262144, 5, 128, "f32"), (262144, 5, 128, "bf16"),
    ]:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, f, d)).astype(np.float32)
        )
        if dt == "bf16":
            x = x.astype(jnp.bfloat16)
        t_x = timeit(xla, x)
        try:
            t_p = timeit(pallas, x)
            note = ""
        except Exception as e:  # pallas may not support a shape
            t_p, note = float("nan"), f"pallas failed: {type(e).__name__}"
        rows.append(("fm_cross", f"B={b} F={f} D={d} {dt}", t_x, t_p, note))


def bench_din(rows):
    from sparrowrecsys_tpu.ops.attention import (
        din_attention_pallas,
        din_attention_xla,
    )

    xla = jax.jit(din_attention_xla)
    rng = np.random.default_rng(0)
    # Final rows = the round-5 MFU configuration (DIN at T=64, dim 128,
    # batch 65536, bf16 history/candidate).
    for b, t, d, h, dt in [
        (8192, 5, 10, 32, "f32"), (4096, 64, 64, 32, "f32"),
        (4096, 256, 64, 64, "f32"),
        (65536, 64, 128, 32, "f32"), (65536, 64, 128, 32, "bf16"),
    ]:
        hist = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
        cand = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(4 * d, h)).astype(np.float32))
        b1 = jnp.zeros(h)
        alpha = jnp.zeros(h)
        w2 = jnp.asarray(rng.normal(size=(h, 1)).astype(np.float32))
        b2 = jnp.zeros(1)
        if dt == "bf16":
            hist = hist.astype(jnp.bfloat16)
            cand = cand.astype(jnp.bfloat16)
        args = (hist, cand, w1, b1, alpha, w2, b2)
        t_x = timeit(xla, *args)
        try:
            t_p = timeit(din_attention_pallas, *args)
            note = ""
        except Exception as e:
            t_p, note = float("nan"), f"pallas failed: {type(e).__name__}"
        rows.append(
            ("din_attention", f"B={b} T={t} D={d} H={h} {dt}", t_x, t_p, note)
        )


def main():
    dev = jax.devices()[0]
    rows = []
    bench_fm(rows)
    bench_din(rows)
    lines = [
        "# KERNELS — Pallas vs XLA microbenchmarks",
        "",
        f"Device: {dev.platform}:{dev.device_kind}. Times are per-call means",
        "(50 iters, post-warmup, forced device->host sync — block_until_ready",
        "returns early on this backend). Auto-dispatch in ops/ picks the winner;",
        "at MovieLens shapes XLA's fusion is usually already optimal — the",
        "Pallas kernels matter at production shapes (long histories, wide",
        "fields).",
        "",
        "| op | shape | xla (µs) | pallas (µs) | winner | note |",
        "|---|---|---|---|---|---|",
    ]
    for op, shape, t_x, t_p, note in rows:
        winner = "xla" if not (t_p == t_p) or t_x <= t_p else "pallas"
        lines.append(
            f"| {op} | {shape} | {t_x * 1e6:.1f} | "
            + (f"{t_p * 1e6:.1f}" if t_p == t_p else "—")
            + f" | {winner} | {note} |"
        )
        print(lines[-1])
    # Regenerate only the header + table; hand-written prose (top-k table,
    # dispatch-policy findings) lives below the marker and is preserved.
    marker = "<!-- tools/kernel_bench.py regenerates everything ABOVE this line -->"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "KERNELS.md"
    )
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        if marker in old:
            tail = old.split(marker, 1)[1]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n\n" + marker + tail)


if __name__ == "__main__":
    main()
