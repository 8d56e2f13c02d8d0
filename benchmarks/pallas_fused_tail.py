"""Pallas fused decoder-tail experiment (ROADMAP r5 #1 / VERDICT r4 next #3).

Fuses the resnet34-unet inner-decode tail after block3 —

    up2x -> conv3x3(32->16)+b+relu -> conv3x3(16->16)+b+relu
         -> head conv3x3(16->19)+b -> softmax max/argmax -> uint8 planes

— into ONE pallas_call: block3's (B, 136, 136, 32) output is read from HBM
once, the two uint8 planes come out, every intermediate lives in VMEM.

Design notes (each choice forced by a measured Mosaic lowering gap — the
probes are recorded in PERFORMANCE.md round 5):
- layout: channels on sublanes, width on lanes; all lane buffers are 384
  wide (the 262-col extent + SAME-pad borders + junk) because Mosaic can
  only fold a (K, n, W) operand into a (K, n*W) matmul when W is a
  multiple of 128.
- the 2x NEAREST upsample row-interleave never happens: b4-grid rows are
  PHASE-DECOMPOSED (even/odd), each phase a plain row-offset view of x3,
  and every conv runs per-phase with phase-mixing taps; the planes are
  de-interleaved by XLA outside the kernel (cheap u8 reshuffle).
- the 2x column expansion is a matmul against a precomputed 0/1
  align-to-nearest matrix (ec), which also bakes in the zero SAME-pad
  border columns.
- conv columns: Mosaic has no bf16 lane rotate, so the 3 dx taps are
  three dots against the SAME dy-stacked K=3cin operand, each dot's f32
  RESULT lane-rolled into the accumulator (f32 rolls are supported);
  wraparound lands in border lanes that are masked to zero.
- rows never need padding: plan_inner_crops' halo arithmetic means the
  rows each stage contaminates are exactly the rows the next stage drops.

Correctness: INTERPRET=1 (CPU) checks argmax equality vs the plain-jnp
tail; the TPU run checks agreement again and times both chained-diff.
Usage:
    python benchmarks/pallas_fused_tail.py             # TPU measure
    INTERPRET=1 python benchmarks/pallas_fused_tail.py # CPU correctness
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE, MARGIN, K = 512, 128, 19

X3_EXTENT = 136   # block3 output rows/cols (offset 60 at 1/2 res)
B4_EXTENT = 262   # block4 extent (offset 125 at full res)
OUT_EXTENT = 256  # head rows kept ([3, 259) of the 262)
TR = 32           # output rows per grid step (16 per phase)
WB = 384          # lane width: 262 + SAME borders + junk, multiple of 128
C3, C4, CH = 32, 16, K


def _col_expand_matrix() -> np.ndarray:
    """(136, WB) 0/1 matrix: out col bc in [1,263) = x3 col (bc+4)//2
    (nearest-2x columns of the [5:267) window); borders/junk cols = 0."""
    ec = np.zeros((X3_EXTENT, WB), np.float32)
    for bc in range(1, 263):
        ec[(bc + 4) // 2, bc] = 1.0
    return ec


def _pack_taps(w: np.ndarray, combine) -> np.ndarray:
    """(3,3,cin,cout) -> (3dx, cout, 2cin or 3cin) with K order (tap, ci).

    ``combine``: list of row-tap weight builders, each a (3,cin,cout)->
    (cin,cout) reduction of the dy axis for that tap.
    """
    cin, cout = w.shape[2], w.shape[3]
    out = np.zeros((3, cout, len(combine) * cin), np.float32)
    for dx in range(3):
        for r, fn in enumerate(combine):
            out[dx, :, r * cin:(r + 1) * cin] = fn(w[:, dx]).T
    return out


def pack_weights(w1, w2, wh):
    """Phase-combined tap matrices (see the kernel's B layouts)."""
    w1e = _pack_taps(w1, [lambda t: t[0] + t[1], lambda t: t[2]])
    w1o = _pack_taps(w1, [lambda t: t[0], lambda t: t[1] + t[2]])
    w2p = _pack_taps(w2, [lambda t: t[0], lambda t: t[1], lambda t: t[2]])
    whp = _pack_taps(wh, [lambda t: t[0], lambda t: t[1], lambda t: t[2]])
    return w1e, w1o, w2p, whp


def tail_reference(x3, w1, b1, w2, b2, wh, bh):
    """Plain-jnp tail (the exact float-walk semantics) for correctness."""
    import jax
    import jax.numpy as jnp

    from flairtpu.models.unet import upsample2x_nearest

    dn = ("NHWC", "HWIO", "NHWC")
    up = upsample2x_nearest(x3)[:, 5:267, 5:267, :]
    y = jax.nn.relu(jax.lax.conv_general_dilated(
        up, w1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b1)
    y = jax.nn.relu(jax.lax.conv_general_dilated(
        y, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b2)
    lg = jax.lax.conv_general_dilated(
        y, wh, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + bh
    lg = lg[:, 3:259, 3:259, :].astype(jnp.float32)
    p = jax.nn.softmax(lg, axis=-1)
    return (jnp.argmax(lg, axis=-1).astype(jnp.uint8),
            jnp.round(jnp.max(p, axis=-1) * 255).astype(jnp.uint8))


def make_kernel(dtype, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _mask_cols(y):
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
        return jnp.where((col >= 1) & (col < 263), y, 0.0)

    def _rolled_conv(w_ref, b_src, n_out):
        """sum_dx roll(W[dx] @ B[:, 0:n_out, :], 1-dx) in f32."""
        acc = None
        for dx, shift in ((0, 1), (1, 0), (2, WB - 1)):
            part = jax.lax.dot_general(
                w_ref[dx], b_src[:, 0:n_out, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if interpret:
                part = jnp.roll(part, 1 - dx, 2)
            elif shift:
                part = pltpu.roll(part, shift, 2)
            acc = part if acc is None else acc + part
        return acc

    def _epilogue(lg):
        """(CH, n, WB) f32 logits -> (uint8 argmax, uint8 round(255*maxp))."""
        mx = lg[0]
        am = jnp.zeros(mx.shape, jnp.int32)
        for c in range(1, CH):
            m = lg[c] > mx
            am = jnp.where(m, c, am)
            mx = jnp.where(m, lg[c], mx)
        s = jnp.zeros(mx.shape, jnp.float32)
        for c in range(CH):
            s = s + jnp.exp(lg[c] - mx)
        prob = jnp.round(255.0 / s).astype(jnp.int32)
        return am.astype(jnp.uint8), prob.astype(jnp.uint8)

    def kernel(x3_ref, ec_ref, w1e_ref, w1o_ref, w2_ref, wh_ref,
               b1_ref, b2_ref, bh_ref,
               clse_ref, clso_ref, prbe_ref, prbo_ref,
               xc_s, b1_s, c1e_s, c1o_s, b2_s, c2e_s, c2o_s):
        t = pl.program_id(1)

        # column-expanded x3 rows [16t, 16t+22): (C3, 22, WB)
        rows = x3_ref[:, pl.ds(pl.multiple_of(16 * t, 16), 22), :]
        xc_s[:, :, :] = jax.lax.dot_general(
            rows, ec_ref[:, :], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

        # conv1 on the phase-decomposed upsample: up_even[k]=x3[k+2],
        # up_odd[k]=x3[k+3] -> 2 row taps per phase
        b1_s[0:C3, 0:19, :] = xc_s[:, 2:21, :]
        b1_s[C3:2 * C3, 0:19, :] = xc_s[:, 3:22, :]
        # even phase contracts B rows [1, 19), odd [0, 18)
        acc_e = None
        acc_o = None
        for dx, shift in ((0, 1), (1, 0), (2, WB - 1)):
            pe = jax.lax.dot_general(
                w1e_ref[dx], b1_s[:, 1:19, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            po = jax.lax.dot_general(
                w1o_ref[dx], b1_s[:, 0:18, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if interpret:
                pe = jnp.roll(pe, 1 - dx, 2)
                po = jnp.roll(po, 1 - dx, 2)
            elif shift:
                pe = pltpu.roll(pe, shift, 2)
                po = pltpu.roll(po, shift, 2)
            acc_e = pe if acc_e is None else acc_e + pe
            acc_o = po if acc_o is None else acc_o + po
        c1e_s[:, :, :] = _mask_cols(
            jax.nn.relu(acc_e + b1_ref[:, :, :])).astype(dtype)
        c1o_s[:, :, :] = _mask_cols(
            jax.nn.relu(acc_o + b1_ref[:, :, :])).astype(dtype)

        # conv2: c2_even[q] = taps (c1o[q], c1e[q], c1o[q+1]);
        #        c2_odd[q]  = taps (c1e[q], c1o[q+1], c1e[q+1]); q in [0,17)
        b2_s[0:C4, 0:17, :] = c1o_s[:, 0:17, :]
        b2_s[C4:2 * C4, 0:17, :] = c1e_s[:, 0:17, :]
        b2_s[2 * C4:3 * C4, 0:17, :] = c1o_s[:, 1:18, :]
        acc = _rolled_conv(w2_ref, b2_s, 17)
        c2e_s[:, :, :] = _mask_cols(
            jax.nn.relu(acc + b2_ref[:, :, :])).astype(dtype)
        b2_s[0:C4, 0:17, :] = c1e_s[:, 0:17, :]
        b2_s[C4:2 * C4, 0:17, :] = c1o_s[:, 1:18, :]
        b2_s[2 * C4:3 * C4, 0:17, :] = c1e_s[:, 1:18, :]
        acc = _rolled_conv(w2_ref, b2_s, 17)
        c2o_s[:, :, :] = _mask_cols(
            jax.nn.relu(acc + b2_ref[:, :, :])).astype(dtype)

        # head: head_even[s] = taps (c2e[s], c2o[s], c2e[s+1]);
        #       head_odd[s]  = taps (c2o[s], c2e[s+1], c2o[s+1]); s in [0,16)
        b2_s[0:C4, 0:16, :] = c2e_s[:, 0:16, :]
        b2_s[C4:2 * C4, 0:16, :] = c2o_s[:, 0:16, :]
        b2_s[2 * C4:3 * C4, 0:16, :] = c2e_s[:, 1:17, :]
        lg_e = _rolled_conv(wh_ref, b2_s, 16) + bh_ref[:, :, :]
        am, prob = _epilogue(lg_e)
        clse_ref[0, :, :] = am
        prbe_ref[0, :, :] = prob
        b2_s[0:C4, 0:16, :] = c2o_s[:, 0:16, :]
        b2_s[C4:2 * C4, 0:16, :] = c2e_s[:, 1:17, :]
        b2_s[2 * C4:3 * C4, 0:16, :] = c2o_s[:, 1:17, :]
        lg_o = _rolled_conv(wh_ref, b2_s, 16) + bh_ref[:, :, :]
        am, prob = _epilogue(lg_o)
        clso_ref[0, :, :] = am
        prbo_ref[0, :, :] = prob

    def run(x3t_flat, ec, w1e, w1o, w2p, whp, b1, b2, bh):
        B = x3t_flat.shape[0] // C3
        grid = (B, OUT_EXTENT // TR)
        u8 = jnp.uint8
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((C3, X3_EXTENT, X3_EXTENT),
                             lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=[pl.BlockSpec((1, TR // 2, WB), lambda b, t: (b, t, 0),
                                    memory_space=pltpu.VMEM)] * 4,
            out_shape=[jax.ShapeDtypeStruct((B, OUT_EXTENT // 2, WB), u8)] * 4,
            scratch_shapes=[
                pltpu.VMEM((C3, 22, WB), dtype),        # xc_s
                pltpu.VMEM((2 * C3, 19, WB), dtype),    # b1_s
                pltpu.VMEM((C4, 18, WB), dtype),        # c1e_s
                pltpu.VMEM((C4, 18, WB), dtype),        # c1o_s
                pltpu.VMEM((3 * C4, 17, WB), dtype),    # b2_s (reused)
                pltpu.VMEM((C4, 17, WB), dtype),        # c2e_s
                pltpu.VMEM((C4, 17, WB), dtype),        # c2o_s
            ],
            interpret=interpret,
        )(x3t_flat, ec, w1e, w1o, w2p, whp, b1, b2, bh)
        cls_e, cls_o, prb_e, prb_o = out
        # de-interleave phases + crop cols [4, 260) -> (B, 256, 256)
        def weave(e, o):
            y = jnp.stack([e, o], axis=2)           # (B, 128, 2, WB)
            return y.reshape(B, OUT_EXTENT, WB)[:, :, 4:260]
        return weave(cls_e, cls_o), weave(prb_e, prb_o)

    return run


def main():
    import jax
    import jax.numpy as jnp

    interpret = bool(os.environ.get("INTERPRET"))
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32 if interpret else jnp.bfloat16

    rng = np.random.default_rng(0)
    B = int(os.environ.get("BATCH", "2" if interpret else "128"))
    x3 = rng.standard_normal((B, X3_EXTENT, X3_EXTENT, C3)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, C3, C4)) * 0.1).astype(np.float32)
    b1 = rng.standard_normal(C4).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, C4, C4)) * 0.1).astype(np.float32)
    b2 = rng.standard_normal(C4).astype(np.float32) * 0.1
    wh = (rng.standard_normal((3, 3, C4, CH)) * 0.1).astype(np.float32)
    bh = rng.standard_normal(CH).astype(np.float32) * 0.1

    run = make_kernel(dtype, interpret)
    w1e, w1o, w2p, whp = pack_weights(w1, w2, wh)
    x3t = np.transpose(x3, (0, 3, 1, 2)).reshape(B * C3, X3_EXTENT, X3_EXTENT)
    args = (jnp.asarray(x3t, dtype),
            jnp.asarray(_col_expand_matrix(), dtype),
            jnp.asarray(w1e, dtype), jnp.asarray(w1o, dtype),
            jnp.asarray(w2p, dtype), jnp.asarray(whp, dtype),
            jnp.asarray(b1.reshape(-1, 1, 1), jnp.float32),
            jnp.asarray(b2.reshape(-1, 1, 1), jnp.float32),
            jnp.asarray(bh.reshape(-1, 1, 1), jnp.float32))
    cls_k, prob_k = jax.jit(run)(*args)
    cls_r, prob_r = tail_reference(jnp.asarray(x3, dtype).astype(dtype),
                                   *(jnp.asarray(a, dtype) for a in
                                     (w1, b1, w2, b2, wh, bh)))
    agree = float((np.asarray(cls_k) == np.asarray(cls_r)).mean())
    dprob = np.abs(np.asarray(prob_k).astype(int)
                   - np.asarray(prob_r).astype(int))
    print(json.dumps({"check": "pallas tail vs jnp reference",
                      "argmax_agree": round(agree, 5),
                      "prob_maxdiff": int(dprob.max()),
                      "interpret": interpret}), flush=True)
    if interpret:
        return

    # ---- chained-diff timing: pallas tail vs the XLA tail on the chip
    fk = jax.jit(lambda x, *w: run(x, *w))
    fr = jax.jit(lambda x, *w: tail_reference(x, *w))
    xr = jnp.asarray(x3, dtype)
    xkt = args[0]
    wargs = tuple(jnp.asarray(a, dtype) for a in (w1, b1, w2, b2, wh, bh))

    def timed(fn, x0, wrap, short=2, long=10, reps=3):
        def chain(n):
            out, xx = None, x0
            for _ in range(n):
                out = fn(xx, *wrap)
                xx = xx.at[0, 0, 0].set(out[0].reshape(-1)[0].astype(xx.dtype))
            t0 = time.perf_counter()
            np.asarray(out[0].reshape(-1)[0])
            return time.perf_counter() - t0

        chain(1)
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    def timed4(fn, x0, wrap, short=2, long=10, reps=3):
        def chain(n):
            out, xx = None, x0
            for _ in range(n):
                out = fn(xx, *wrap)
                xx = xx.at[0, 0, 0, 0].set(
                    out[0][0, 0, 0].astype(xx.dtype))
            t0 = time.perf_counter()
            np.asarray(out[0][0, 0, 0])
            return time.perf_counter() - t0

        chain(1)
        return min((chain(long) - chain(short)) / (long - short)
                   for _ in range(reps))

    dt_k = timed(fk, xkt, args[1:])
    dt_r = timed4(fr, xr, wargs)
    print(json.dumps({
        "batch": B,
        "pallas_ms": round(dt_k * 1e3, 2),
        "xla_ms": round(dt_r * 1e3, 2),
        "speedup": round(dt_r / dt_k, 3)}), flush=True)


if __name__ == "__main__":
    main()
