"""Pallas TPU kernel for batched banded x-drop extension.

The performance path behind ``extend_batch`` (bella_tpu/align/xdrop.py):
the TPU-native equivalent of both Xavier's AVX2 core loop
(xavier/xavier.h:105-183, one alignment per core, 31 int8 lanes) and
LOGAN's CUDA kernel (loganGPU/functions.cuh:223-408, one alignment per
thread block). TPUs have a single scalar unit per core, so the design
goal is ZERO per-step scalar/dynamic-index work:

  * one grid cell advances a block of alignments in lockstep — pairs on
    the sublane axis, the band (W lanes) on the lane axis;
  * the band follows a STATIC centered trajectory: the band offset
    ``lo(d) = max(0, (d - W + 1) // 2)`` is a shared scalar function of
    the antidiagonal index, not a per-pair adaptive quantity (the
    reference adapts a 31-wide band toward the argmax,
    xavier/simdutils.h:263-289; we compensate with a 4-8x wider band —
    band cells are cheap on the VPU, per-pair scalar divergence is not);
  * sequence characters enter the band windows strictly in order, so
    they stream through small rolling feed buffers refilled once per
    chunk by a single dynamic lane-slice whose offset is shared by the
    whole block;
  * x-drop termination latches per pair inside the chunk and the
    while-loop exits when every pair in the block is dead;
  * when every antidiagonal index fits 16 bits (reads <= ~15 kbp), the
    DP state runs in int16 at 16 pairs/block — double lane density, the
    moral equivalent of Xavier's int8 lanes (xavier/simdutils.h:22-42)
    but without its score renormalisation: scores are clamped at a
    floor far below any x-drop threshold, so results stay exact.

The only deviation from the pure-JAX ``extend_batch`` is the band
trajectory, which can differ once the optimal path drifts more than W/2
off the main diagonal — with the default W=256 that is far beyond the
diagonal drift of real long-read error processes (the reference ships
W=31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NINF32 = -(1 << 20)   # python ints: jnp scalars would be captured tracers
NINF16 = -20000       # one more gap/mismatch add cannot wrap int16
PAD = 127

CHUNK = 128     # steps per feed refill / termination check (compiled)
CHUNK_INTERPRET = 32  # interpret mode fully unrolls the chunk in the
# interpreter: a small chunk keeps test traces fast; results are
# identical (the chunk size only sets check granularity)
I16_MAX_D = 30000  # use int16 DP while max diagonal (t_len+q_len) fits


def _lo(d, W):
    """Band offset at antidiagonal d (shared scalar trajectory).

    All scalar arithmetic is explicit int32: binops between traced values
    and python ints promote through int64 under x64, which Mosaic cannot
    lower. (d - (W-1)) >> 1 == floor((d - W + 1) / 2) for int32."""
    return jnp.maximum(jnp.int32(0), (d - jnp.int32(W - 1)) >> jnp.int32(1))


def _roll_l(a):
    """out[:, p] = a[:, p+1]; last lane wraps (caller overwrites/masks).
    Static concatenate shifts: pltpu.roll with a python shift traces as
    an i64 dynamic_rotate under x64 (Mosaic rejects it) and a traced
    int32 shift stays a runtime dynamic_rotate; the concat form is a
    compile-time-known lane shift."""
    return jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)


def _roll_r(a):
    """out[:, p] = a[:, p-1]; first lane wraps."""
    return jnp.concatenate([a[:, -1:], a[:, :-1]], axis=1)


def _unpack_chars(win, off, width: int, bb: int, sdt):
    """Expand `width` base chars starting at base offset `off` (scalar,
    0..15) from a word window already rotated so its word 0 holds the
    wanted base 0. Chars unpack lane-wise: char t reads word (t+off)>>4
    at bit 2*((t+off)&15) — a few broadcast-selects per 16 chars, paid
    once per feed refill."""
    u32 = jnp.uint32
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, width), 1)
    tt = lane + off
    bit = ((tt & jnp.int32(15)) * jnp.int32(2)).astype(u32)
    wsel = tt >> jnp.int32(4)
    out = jnp.zeros((bb, width), u32)
    for j in range((width + 30) >> 4):
        wj = win[:, j:j + 1]
        out = jnp.where(wsel == j, (wj >> bit) & u32(3), out)
    return out.astype(sdt)


def _kernel(t_ref, q_ref, tl_ref, ql_ref, score_ref, te_ref, qe_ref,
            *, W, xdrop, match, mismatch, gap, max_chunks, bb, use_i16,
            chunk_steps, packed=False):
    sdt = jnp.int16 if use_i16 else jnp.int32
    lane = jax.lax.broadcasted_iota(sdt, (bb, W), 1)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (bb, W), 1)
    # hoisted lane-edge masks: the step bodies select against lane 0 /
    # lane W-1 every antidiagonal; computing the compares once keeps
    # them out of the unrolled step loops (they are closure constants,
    # not loop-carried state, so Mosaic's i1-carry limitation is moot)
    m_lane0 = lane32 == 0
    m_laneW = lane32 == (W - 1)
    t_len = tl_ref[:]  # (bb, 1) int32
    q_len = ql_ref[:]
    t_len_s = t_len.astype(sdt)
    q_len_s = q_len.astype(sdt)
    # strong typed scalars: weak python ints promote through int64 under
    # x64, and Mosaic's 64-bit convert lowering recurses
    ninf = sdt(NINF16 if use_i16 else NINF32)
    pad = sdt(PAD)

    # --- initial state: mirrors extend_batch (xdrop.py:78-99), lo = 0 ---
    # diag 0: D[0][0] = 0 at p=0; diag 1: the two gap cells
    a1 = jnp.where(lane == 0, sdt(0), ninf)
    a2 = jnp.where(
        lane == 0, jnp.where(q_len_s >= 1, sdt(gap), ninf),
        jnp.where(lane == 1, jnp.where(t_len_s >= 1, sdt(gap), ninf), ninf),
    )
    # char windows for diag d=2: twin[p] = T[p-1], qwin[p] = Q[1-p]
    if packed:
        # word window covering the W-char head: (W+30)>>4 words, padded
        # to a 128-multiple (wide rescue bands pass W > 2048 chars = 128
        # words; the fixed 128-word slice underflowed the unpack loop)
        nw = -(-((W + 30) >> 4) // 128) * 128
        thead = _unpack_chars(t_ref[:, :nw], jnp.int32(0), W, bb, sdt)
        qw0 = q_ref[:, 0:1]
        q0 = (qw0 & jnp.uint32(3)).astype(sdt)
        q1 = ((qw0 >> jnp.uint32(2)) & jnp.uint32(3)).astype(sdt)
    else:
        thead = t_ref[:, :W].astype(sdt)
        qhead = q_ref[:, :128].astype(sdt)
        q0 = qhead[:, 0:1]
        q1 = qhead[:, 1:2]
    twin = jnp.where(lane == 0, pad, _roll_r(thead))
    qwin = jnp.where(lane == 0, q1, jnp.where(lane == 1, q0, pad))

    tq_len = t_len + q_len  # (bb, 1) end-diagonal, hoisted out of the step
    best = jnp.zeros((bb, 1), jnp.int32)
    # coordinate tracking is PER LANE (best_lane/d_best) instead of a
    # per-step argmax: the second cross-lane reduce per step was ~20% of
    # the step's serial latency chain. The final selection (min d, then
    # min lane, among lanes holding the global best) is exactly the
    # per-step semantics: a lane at the global best recorded its first
    # time reaching it, so min-d is the first global occurrence.
    best_lane = jnp.zeros((bb, W), jnp.int32)
    d_best = jnp.zeros((bb, W), jnp.int32)
    # alive is carried as int32 0/1: Mosaic cannot legalize loop-carried
    # i1 vectors (scf.yield layout mismatch)
    alive = (tq_len > 0).astype(jnp.int32)

    def make_step(mode, s_idx=0):
        """One-antidiagonal step body, specialized by band-trajectory
        phase. The static centered trajectory makes every per-step
        select a pure function of d (see _lo), and d is a pure function
        of the chunk start d0 and the python step index:

          * 'ramp'    — all d in the chunk <= W-2, so lo == 0: no band
            advance, shift_d == -1, dlt1 == 0 (selects resolve at trace
            time);
          * 'steady'  — all d in the chunk >= W+1: lo advances exactly
            on even d, and chunk starts d0 = 2 + c*chunk_steps are even
            (chunk_steps is even), so step parity s_idx decides
            adv/dlt1 statically and shift_d == 0 always;
          * 'generic' — dynamic scalar selects (only the single chunk
            spanning the ramp->steady boundary).

        Cutting the trajectory selects out of the unrolled step loop
        removes ~40% of the per-step vector ops on the two hot bodies
        (the reference pays per-step branch logic too:
        xavier/simdutils.h:263-289 moveRight/moveDown)."""
        adv_st = mode == "steady" and s_idx % 2 == 0
        dlt1_st = s_idx % 2 == 1

        def step(st):
            (a1, a2, twin, qwin, tfeed, qfeed, best, best_lane, d_best,
             alive, d) = st
            one = jnp.int32(1)
            lo = _lo(d, W)

            sub = jnp.where(twin == qwin, sdt(match), sdt(mismatch))
            # predecessors (extend_batch convention, xdrop.py:119-137)
            # with SCALAR dlt selects in the generic body. shift_d =
            # lo(d) - lo(d-2) - 1 (at most one of the deltas is 1).
            if mode == "ramp":
                diag_pred = jnp.where(m_lane0, ninf, _roll_r(a1))
                gq_pred = jnp.where(m_lane0, ninf, _roll_r(a2))
                gt_pred = a2
            elif mode == "steady":
                diag_pred = a1
                if dlt1_st:
                    gq_pred = a2
                    gt_pred = jnp.where(m_laneW, ninf, _roll_l(a2))
                else:
                    gq_pred = jnp.where(m_lane0, ninf, _roll_r(a2))
                    gt_pred = a2
            else:
                dlt1 = lo - _lo(d - one, W)
                shift_d = lo - _lo(d - jnp.int32(2), W) - one
                diag_pred = jnp.where(
                    shift_d == -1, jnp.where(lane == 0, ninf, _roll_r(a1)),
                    jnp.where(
                        shift_d == 0, a1,
                        jnp.where(lane == W - 1, ninf, _roll_l(a1)),
                    ),
                )
                gq_pred = jnp.where(
                    dlt1 == 1, a2, jnp.where(lane == 0, ninf, _roll_r(a2))
                )
                gt_pred = jnp.where(
                    dlt1 == 1, jnp.where(lane == W - 1, ninf, _roll_l(a2)),
                    a2,
                )
            a3 = jnp.maximum(
                diag_pred + sub, jnp.maximum(gq_pred, gt_pred) + sdt(gap)
            )
            # DP-matrix validity in the state dtype. NOTE: the
            # "collapse to m2 <= lane <= m1 scalar bounds" rewrite (3
            # broadcast ops instead of 7 element-wise) was measured
            # SLOWER on hardware at every block size (bb=24: 287 ->
            # 460 ms on the 8192x mixed probe) — the (bb,1)-broadcast
            # compares cost more than the element-wise chain they
            # replace; keep the i/j form.
            i = lane if mode == "ramp" else lo.astype(sdt) + lane
            j = d.astype(sdt) - i
            if mode == "steady":
                # j >= 0 is vacuous here: steady runs at d >= W+1 where
                # j = d - lo - lane >= (d - W + 1)/2 >= 1 for every lane
                valid = (i <= t_len_s) & (j <= q_len_s)
            else:
                valid = (i <= t_len_s) & (j >= 0) & (j <= q_len_s)
            if use_i16:
                # int16 needs the lower clamp: gap adds drift dead cells
                # toward INT16_MIN over >6k steps and would wrap
                a3 = jnp.where(valid, jnp.maximum(a3, ninf), ninf)
            else:
                # int32 headroom makes the clamp redundant: dead-cell
                # drift is bounded by 2*max_steps <= 2^19 below
                # NINF32 = -2^20, nowhere near int32 wrap
                a3 = jnp.where(valid, a3, ninf)

            # ONE cross-lane reduction per step (x-drop liveness); the
            # lane maxima update element-wise, gated on liveness so
            # records freeze at x-drop death as the per-step argmax did
            a3_32 = a3.astype(jnp.int32)
            cur = jnp.max(a3_32, axis=1, keepdims=True)
            gate = (alive > 0) & (a3_32 > best_lane)
            best_lane = jnp.where(gate, a3_32, best_lane)
            d_best = jnp.where(gate, d, d_best)
            improved = (alive > 0) & (cur > best)
            best = jnp.where(improved, cur, best)
            alive = (
                (alive > 0) & (cur >= best - jnp.int32(xdrop))
                & (d < tq_len)
            ).astype(jnp.int32)

            # window + feed updates for diag d+1 (consume T when the
            # band advances, Q when it does not — in sequence order).
            # ramp/steady read the feed at a STATIC python index (the
            # per-chunk consumption schedule is a pure function of the
            # step parity), so the per-step feed roll disappears from
            # the two hot bodies; only the generic boundary chunk keeps
            # the rolling-buffer form.
            if mode == "ramp":
                qwin = jnp.where(
                    m_lane0, qfeed[:, s_idx:s_idx + 1], _roll_r(qwin)
                )
            elif mode == "steady":
                if adv_st:
                    twin = jnp.where(
                        m_laneW, tfeed[:, s_idx // 2:s_idx // 2 + 1],
                        _roll_l(twin),
                    )
                else:
                    qwin = jnp.where(
                        m_lane0, qfeed[:, s_idx // 2:s_idx // 2 + 1],
                        _roll_r(qwin),
                    )
            else:
                dlt2 = _lo(d + one, W) - lo
                adv = dlt2 == 1
                twin_adv = jnp.where(
                    lane == W - 1, tfeed[:, 0:1], _roll_l(twin)
                )
                qwin_stay = jnp.where(lane == 0, qfeed[:, 0:1], _roll_r(qwin))
                twin = jnp.where(adv, twin_adv, twin)
                qwin = jnp.where(adv, qwin, qwin_stay)
                tfeed = jnp.where(adv, _roll_l(tfeed), tfeed)
                qfeed = jnp.where(adv, qfeed, _roll_l(qfeed))

            return (a2, a3, twin, qwin, tfeed, qfeed, best, best_lane,
                    d_best, alive, d + one)

        return step

    def load_feed(ref, ptr):
        """Feed refill at an arbitrary offset: Mosaic only allows dynamic
        lane offsets that are 128-aligned, so load an aligned window of
        chunk_steps+128 (off < 128 chars of slack) and rotate the wanted
        chunk to the front. Packed refs hold u32 words of 16 bases: load
        a 128-aligned WORD window, rotate the wanted word to lane 0, and
        expand chunk_steps chars (sub-word offset handled in the
        expansion)."""
        if packed:
            wptr = ptr >> jnp.int32(4)
            base = pl.multiple_of((wptr >> jnp.int32(7)) << jnp.int32(7), 128)
            win = ref[:, pl.ds(base, 256)]
            ow = wptr - base  # in [0, 128)
            rot = pltpu.roll(win, (jnp.int32(256) - ow) % jnp.int32(256), 1)
            return _unpack_chars(rot, ptr & jnp.int32(15), chunk_steps, bb,
                                 sdt)
        win_w = -(-(chunk_steps + 128) // 128) * 128  # 128-multiple width
        base = pl.multiple_of((ptr >> jnp.int32(7)) << jnp.int32(7), 128)
        win = ref[:, pl.ds(base, win_w)].astype(sdt)
        off = ptr - base  # in [0, 128)
        rot = pltpu.roll(win, (jnp.int32(win_w) - off) % jnp.int32(win_w), 1)
        return rot[:, :chunk_steps]

    def make_chunk(mode):
        def chunk(st):
            (a1, a2, twin, qwin, best, best_lane, d_best, alive, d, t_ptr,
             q_ptr, c) = st
            tfeed = load_feed(t_ref, t_ptr)
            qfeed = load_feed(q_ref, q_ptr)
            inner = (a1, a2, twin, qwin, tfeed, qfeed, best, best_lane,
                     d_best, alive, d)
            # python-unrolled (Mosaic fori supports only unroll=1 or
            # full; full unroll removes per-step loop overhead, and the
            # python step index feeds the static steady-parity selects)
            for s in range(chunk_steps):
                inner = make_step(mode, s)(inner)
            (a1, a2, twin, qwin, _tf, _qf, best, best_lane, d_best,
             alive, d_end) = inner
            # T chars consumed this chunk = band advance = lo(d_end)-lo(d)
            if mode == "ramp":
                adv = jnp.int32(0)
            elif mode == "steady":
                adv = jnp.int32(chunk_steps // 2)
            else:
                adv = _lo(d_end, W) - _lo(d, W)
            t_ptr = t_ptr + adv
            q_ptr = q_ptr + (jnp.int32(chunk_steps) - adv)
            return (a1, a2, twin, qwin, best, best_lane, d_best, alive,
                    d_end, t_ptr, q_ptr, c + jnp.int32(1))

        return chunk

    def cond_until(limit: int):
        def cond(st):
            # int32 reduction, not jnp.any: Mosaic lowers bool reductions
            # via floats, which become float64 under x64 and fail to
            # scalarize
            any_alive = jnp.max(st[7]) > 0
            return any_alive & (st[11] < jnp.int32(limit))

        return cond

    st = (a1, a2, twin, qwin, best, best_lane, d_best, alive,
          jnp.int32(2), jnp.int32(W - 1), jnp.int32(2), jnp.int32(0))
    # trajectory phases as chunk-index ranges (module docstring): pure
    # ramp while the whole chunk keeps d+1 <= W-1, pure steady once
    # d0 >= W+1, one generic chunk at the boundary
    n_ramp = max(0, (W - 3) // chunk_steps)
    c_steady = (W - 1 + chunk_steps - 1) // chunk_steps
    if n_ramp > 0:
        st = jax.lax.while_loop(
            cond_until(min(n_ramp, max_chunks)), make_chunk("ramp"), st
        )
    if c_steady > n_ramp:
        st = jax.lax.while_loop(
            cond_until(min(c_steady, max_chunks)), make_chunk("generic"), st
        )
    st = jax.lax.while_loop(
        cond_until(max_chunks), make_chunk("steady"), st
    )
    best, best_lane, d_best = st[4], st[5], st[6]
    # final coordinate selection: min (d, lane) among lanes holding the
    # global best == first step reaching it, then lowest lane (the exact
    # per-step argmax tie-break); W is a power of two so d*W+lane packs
    at_best = best_lane == best
    key = jnp.where(
        at_best, d_best * jnp.int32(W) + lane32, jnp.int32(0x7FFFFFFF)
    )
    kmin = jnp.min(key, axis=1, keepdims=True)
    lane_sel = kmin & jnp.int32(W - 1)
    d_sel = kmin >> jnp.int32(W.bit_length() - 1)
    te = _lo(d_sel, W) + lane_sel
    score_ref[:] = best
    te_ref[:] = te
    qe_ref[:] = d_sel - te


@functools.partial(
    jax.jit,
    static_argnames=(
        "xdrop", "band", "max_steps", "match", "mismatch", "gap", "interpret"
    ),
)
def extend_batch_pallas(
    T, t_len, Q, q_len, xdrop,
    band: int = 256,
    max_steps: int = 0,
    match: int = 1,
    mismatch: int = -1,
    gap: int = -1,
    interpret: bool = False,
):
    """Drop-in for extend_batch (same contract) on the Pallas TPU path.

    T, Q: (B, L) int8 code arrays (values 0..3 valid, anything else
    beyond the per-row lengths); t_len, q_len: (B,) int32; xdrop must be
    a concrete python int (it is config, constant per run).
    """
    B, L = T.shape
    W = max(128, -(-int(band) // 128) * 128)
    if max_steps <= 0:
        max_steps = 2 * L
    chunk_steps = CHUNK_INTERPRET if interpret else CHUNK
    max_chunks = -(-int(max_steps) // chunk_steps) + 1

    # int16 DP (16 pairs/block, double lane density) is implemented and
    # interpret-verified, but DISABLED: this target's Mosaic rejects
    # 16-bit rotates ("Rotate with non-32-bit data"), 16-bit iota, AND
    # 16-bit vector compares ("Target does not support this comparison")
    # — i16 vectors are second-class and lower by unpacking to 32-bit,
    # so there is no lane-density win to recover; int32 is the fast path.
    use_i16 = False and 2 * L + CHUNK < I16_MAX_D
    # pairs per block: re-measured after the static-trajectory step
    # specialization — 16 pairs x 256 lanes now wins (see the packed
    # entry's note; pre-specialization bb=16 measured 1.4x slower per
    # base, so this default tracks the step body).
    bb = 16 if use_i16 else (32 if W <= 128 else (16 if W <= 256 else 8))
    seq_dt = jnp.int16 if use_i16 else jnp.int32

    # pad: B to blocks of bb; L so windows/feeds never read out of range
    # (T chars consumed <= lo(d_max) + W + CHUNK <= max_steps//2 + W + CHUNK).
    # Sequences are widened from int8: sub-native-sublane int8 tiles
    # lower poorly.
    Bp = -(-B // bb) * bb
    # margin: feed windows read up to 256 past the furthest pointer, and
    # q_ptr can reach ~L + W before the x-drop kills the last pair
    Lp = -(-(max(L, W) + W + 2 * CHUNK + 256) // 128) * 128
    Tp = jnp.full((Bp, Lp), PAD, seq_dt)
    Tp = Tp.at[:B, :L].set(T.astype(seq_dt))
    Qp = jnp.full((Bp, Lp), PAD, seq_dt)
    Qp = Qp.at[:B, :L].set(Q.astype(seq_dt))
    tl = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(t_len.astype(jnp.int32))
    ql = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(q_len.astype(jnp.int32))

    kernel = functools.partial(
        _kernel, W=W, xdrop=int(xdrop), match=match, mismatch=mismatch,
        gap=gap, max_chunks=max_chunks, bb=bb, use_i16=use_i16,
        chunk_steps=chunk_steps,
    )
    # index maps return typed zeros: a python 0 traces as i64 under x64,
    # which Mosaic cannot return from the index-map func
    zero = lambda i: (i, jnp.int32(0))
    blk = pl.BlockSpec((bb, Lp), zero, memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((bb, 1), zero, memory_space=pltpu.VMEM)
    score, te, qe = pl.pallas_call(
        kernel,
        grid=(Bp // bb,),
        in_specs=[blk, blk, blk1, blk1],
        out_specs=[blk1, blk1, blk1],
        out_shape=[jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 3,
        interpret=interpret,
    )(Tp, Qp, tl, ql)
    return dict(score=score[:B, 0], t_end=te[:B, 0], q_end=qe[:B, 0])


@functools.partial(
    jax.jit,
    static_argnames=(
        "xdrop", "band", "max_steps", "match", "mismatch", "gap", "interpret"
    ),
)
def extend_batch_pallas_packed(
    Tw, t_len, Qw, q_len, xdrop,
    band: int = 256,
    max_steps: int = 0,
    match: int = 1,
    mismatch: int = -1,
    gap: int = -1,
    interpret: bool = False,
):
    """extend_batch on packed-word sequences: T, Q are (B, L/16) uint32
    matrices of 16 LSB-first 2-bit bases per word (xdrop.pack_words
    layout). The kernel expands chars in its feed path, so the 16x
    smaller word buffers are all that is padded, shipped, and streamed —
    the production path behind align_candidates (the int8->int32
    widened char matrices of extend_batch_pallas cost more HBM traffic
    than the whole wavefront)."""
    B, WpIn = Tw.shape
    L = WpIn * 16
    W = max(128, -(-int(band) // 128) * 128)
    if max_steps <= 0:
        max_steps = 2 * L
    chunk_steps = CHUNK_INTERPRET if interpret else CHUNK
    max_chunks = -(-int(max_steps) // chunk_steps) + 1
    import os as _os

    # 24 pairs/block re-measured BEST after the static-trajectory step
    # specialization (8192x mixed-length probe: 545 ms at bb=8, 366 at
    # 16, 287 at 24, 527 at 32 — non-monotonic: past 3 sublane tiles
    # the step body spills): with ~40% fewer ops per step the wider
    # block now fills the VPU instead of overflowing it.
    # (Pre-specialization bb=16 measured 1.4x SLOWER per base —
    # defaults are empirical and re-measured when the step body
    # changes; override: BELLA_PALLAS_BB.)
    bb = int(_os.environ.get("BELLA_PALLAS_BB", 0)) or (
        32 if W <= 128 else (24 if W <= 256 else 8)
    )
    u32 = jnp.uint32

    Bp = -(-B // bb) * bb
    # char-domain margin as extend_batch_pallas, plus the word window's
    # 256-word (4096-char) reach beyond the furthest pointer
    Lp = -(-(max(L, W) + W + 2 * CHUNK + 256) // 128) * 128
    LpW = -(-Lp // (16 * 128)) * 128 + 256
    Tp = jnp.zeros((Bp, LpW), u32).at[:B, :WpIn].set(Tw)
    Qp = jnp.zeros((Bp, LpW), u32).at[:B, :WpIn].set(Qw)
    tl = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(t_len.astype(jnp.int32))
    ql = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(q_len.astype(jnp.int32))

    kernel = functools.partial(
        _kernel, W=W, xdrop=int(xdrop), match=match, mismatch=mismatch,
        gap=gap, max_chunks=max_chunks, bb=bb, use_i16=False,
        chunk_steps=chunk_steps, packed=True,
    )
    zero = lambda i: (i, jnp.int32(0))
    blk = pl.BlockSpec((bb, LpW), zero, memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((bb, 1), zero, memory_space=pltpu.VMEM)
    score, te, qe = pl.pallas_call(
        kernel,
        grid=(Bp // bb,),
        in_specs=[blk, blk, blk1, blk1],
        out_specs=[blk1, blk1, blk1],
        out_shape=[jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 3,
        interpret=interpret,
    )(Tp, Qp, tl, ql)
    return dict(score=score[:B, 0], t_end=te[:B, 0], q_end=qe[:B, 0])


def pallas_available() -> bool:
    """True when the compiled (non-interpret) kernel can run here."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
