"""Mode 'F': the TPU-native fast profile — LZ77 + per-block STATIC rANS.

The adaptive codecs ('P'/'R'/'X') pay ~8 random table accesses per decoded
byte; the per-step serialization of those accesses bounds them to a few
MB/s on a v5e regardless of lane count (PERF.md round 2).  Mode F removes
every adaptive table from the coding loop:

  * the encoder runs the SAME search + flexible-parse passes as mode 'X'
    (codec/block.py:_search_and_parse), then codes the decisions with
    per-block static tables built in one histogram pass (the zstd-class
    architecture, re-expressed for S lock-step rANS lanes);
  * literal byte and match-start (with its distance bucket) share one
    281-symbol A alphabet; match length is a 256-symbol B alphabet;
    distance mantissas ride table-free uniform events (as in mode 'X');
  * the decode scan per step: static find_symbol (a broadcast compare —
    no gather), the output copy-gather, and the rANS stream reads.  No
    model state, no scatters, no winner dedup.

The static tables ride the payload verbatim (u16 per symbol, already
normalized to sum exactly M); the decoder validates the sum and reuses
the identity (c, f) path (tot == M makes query-time normalization the
identity, ops/rans.py:norm_cf).

No reference analogue: richox/comprox has no fast profile; this is the
capability a TPU deployment needs to cover the zstd/gzip speed class with
the same container, search engine, and lane-interleaved entropy layer.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from comprox_tpu.codec.block import (
    BlockParams,
    SYM_DST_REPEAT,
    _dist_bucket,
    _greedy_decisions,
    _lane_ids,
    _pack_words,
    _parse_body,
    _rep_lengths,
    _search_and_parse,
    _sim_prev_dist,
)
from comprox_tpu.models import tables as tb
from comprox_tpu.ops import rans
from comprox_tpu.ops.rans_scalar import M, RANS_L

_i32 = jnp.int32
_u32 = jnp.uint32

import os as _os

# 'sort' = the block-parallel sort-based finder below (the fast default);
# 'scan' = reuse the adaptive codecs' per-step search scan (mode-'X'
# machinery; ~30x slower encode, slightly better ratio — kept for sweeps)
_F_FINDER = _os.environ.get("CPX_F_FINDER", "sort")

W_A = 256 + 25  # literals + match-start with dist bucket 0..23 + repeat(24)
W_L = 256  # match length - min_len
N_SLOTS = 4  # A, len, dist-hi, dist-lo


def _search_params(p: BlockParams) -> BlockParams:
    """Mode F reuses the 'X' search + parse machinery verbatim."""
    return dataclasses.replace(p, mode="X")


# --------------------------------------------------------------------------
# Block-parallel match finder (no per-step scan).
#
# The adaptive search scan costs ~1ms/step regardless of lanes, putting
# mode-F encode at 0.27 MB/s (round-2 verdict: the fast profile's encoder
# was the SLOWEST in the tree).  This finder touches every position once
# with whole-block vectorized ops instead:
#
#   1. hash the 6-byte gram at every position (static shifted slices);
#   2. one stable sort by (hash, pos) — equal grams become adjacent with
#      positions ascending, so the K previous entries in sort order ARE
#      the K most recent previous occurrences (the hash-chain walk of
#      roxmain/cr-matcher.c:237-340, collapsed into one sort);
#   3. scatter the candidates back to position order;
#   4. byte-equality + diagonal-run extension: match length per position
#      via ONE gathered byte compare and a reverse running-min over the
#      diagonal-continuity mask (Hillis-Steele, static shifts — no
#      per-length gathers).  Lengths are exact while candidates stay on
#      one diagonal (cand[i+1] == cand[i]+1, which repetitive content
#      satisfies) and conservatively truncated where they don't.
#
# Cost: one N-key sort, one row scatter, 2 element gathers per candidate,
# and ~22 elementwise shift/min passes — all O(N) vector work, no
# sequential dependency on block length.
# --------------------------------------------------------------------------

_F_CANDS = 3  # previous occurrences probed per position


_F_EXT = int(_os.environ.get("CPX_F_EXT", "64"))  # word-extension cap
# (bytes): shallower than mode 'X' (speed profile); longer matches
# continue as repeat-distance chains or via the diagonal-run recovery

# parse prices for the STATIC-table profile, fifths of a bit: literals
# cost their static entropy (~5-6 b), not the adaptive PPM's ~2 b —
# using X's prices measured +0.27 bpb (2MiB: 1.635 vs 1.361); greedy
# parse sat between (1.519).  Swept lit 22-28 / xm 35-45: flat optimum.
_F_PRICES = tuple(
    int(_os.environ.get(k, d))
    for k, d in (
        ("CPX_F_PARSE_LIT", "28"),
        ("CPX_F_PARSE_M", "45"),
        ("CPX_F_PARSE_K", "6"),
        ("CPX_F_PARSE_REP", "30"),
    )
)


def _fast_find_matches(p: BlockParams, inp_flat, n):
    """Candidates + parse for every position, scan-free (the shared
    sort-based finder, block.sort_candidates).  Returns (ts [T],
    take [T,S], src [T,S]) — the decision grids _replay_body executes
    (same contract as block._search_and_parse)."""
    from comprox_tpu.codec.block import sort_candidates

    cands = sort_candidates(
        p, inp_flat, n, n_cands=_F_CANDS, ext=min(_F_EXT, p.window)
    )

    # grids in [T, S] step-major order (position = lane * T + t)
    def grid(v):
        return v.reshape(p.lanes, p.steps).T

    outs = tuple(g for l, s in cands for g in (grid(l), grid(s)))
    ts = jnp.arange(p.steps, dtype=_i32)
    if p.flexible:
        xs = (ts,) + outs
        cw0 = jnp.zeros((p.lanes, p.window), _i32)
        parse = functools.partial(
            _parse_body, _search_params(p), n, prices=_F_PRICES
        )
        _, (take, src_g, _idx) = jax.lax.scan(parse, cw0, xs, reverse=True)
        if _os.environ.get("CPX_F_REP", "0") == "1":
            # rep-aware second iteration (block.py _search_and_parse):
            # repeat-distance matches cost one hot A symbol, no mantissa.
            # Measured ratio-NEGATIVE for the static profile at every rep
            # price (1.412/1.405/1.385 at rep 30/45/60 vs 1.361 without —
            # rep matches displace regular ones and dilute the A table);
            # knob kept for the record, default off
            ts_ = jnp.arange(p.steps, dtype=_i32)
            prev_arr = _sim_prev_dist(p, ts_, take, src_g)
            len_rep = _rep_lengths(p, inp_flat, n, ts_, prev_arr)
            xs2 = xs + (len_rep, prev_arr)
            _, (take, src_g, _idx) = jax.lax.scan(
                parse, cw0, xs2, reverse=True
            )
    else:
        take, src_g = _greedy_decisions(_search_params(p), n, outs)
    return ts, take, src_g


def normalize_freqs(h, width: int):
    """[W] raw counts -> [W] i32 static frequencies summing exactly to M,
    with f > 0 iff h > 0.  All-i32 arithmetic: counts pre-shift until the
    total fits 15 bits (h2*M stays < 2^30), present symbols keep >= 1.
    The drift lands on the argmax symbol — provably safe for W <= 282 at
    M = 2^15 (max-floor >= (M-W)/W > possible drift)."""
    h = h.astype(_i32)
    total = jnp.sum(h)
    # shift until total < 2^15
    def body(state):
        hh, sh = state
        return jnp.where(hh > 0, jnp.maximum(hh >> 1, 1), 0), sh + 1

    def cond(state):
        hh, _ = state
        return jnp.sum(hh) >= (1 << 15)

    h2, _ = jax.lax.while_loop(cond, body, (jnp.where(h > 0, h, 0), 0))
    n2 = jnp.maximum(jnp.sum(h2), 1)
    s = jnp.where(h2 > 0, jnp.maximum(1, (h2 * M) // n2), 0)
    drift = M - jnp.sum(s)
    imax = jnp.argmax(s)
    s = s.at[imax].add(drift)
    return s


def _replay_body(p: BlockParams, inp, n, carry, xs):
    """Encode pass: replay parse decisions into per-step static-coding
    events.  Pure VPU state machine — no tables."""
    rem, csrc, prev = carry
    t, take, src = xs
    lanes = _lane_ids(p.lanes)
    pos = lanes * p.steps + t
    active = pos < n
    coding = active & (rem == 0)
    byte = jax.lax.dynamic_slice(inp, (0, t), (p.lanes, 1))[:, 0].astype(
        _i32
    )
    is_match = coding & (take > 0)
    dist = jnp.where(is_match, jnp.maximum(pos - src, 1), 1)
    repeat = is_match & (dist == prev)
    k = jnp.where(repeat, SYM_DST_REPEAT, _dist_bucket(dist))
    sym_a = jnp.where(is_match, 256 + jnp.clip(k, 0, 24), byte)
    sym_len = jnp.clip(jnp.where(is_match, take - p.min_len, 0), 0, W_L - 1)
    # distance mantissa split (mode-'X' rule: block.py D/E events)
    k_dist = jnp.clip(jnp.where(repeat, 0, k), 0, 24)
    b_lo = jnp.minimum(k_dist, 12)
    b_hi = k_dist - b_lo
    has_extra = is_match & ~repeat
    mant = dist - jnp.left_shift(jnp.ones_like(dist), k_dist)
    e_hi = jnp.where(has_extra, mant >> b_lo, 0)
    e_lo = jnp.where(has_extra, mant & ((1 << b_lo) - 1), 0)
    act_d = has_extra & (b_hi > 0)
    act_e = has_extra & (b_lo > 0)
    new_rem = jnp.where(is_match, take - 1, jnp.maximum(rem - 1, 0))
    new_src = jnp.where(is_match, src + 1, csrc + 1)
    new_prev = jnp.where(is_match, dist, prev)
    out = (
        sym_a, coding, sym_len, is_match,
        e_hi, b_hi, act_d, e_lo, b_lo, act_e,
    )
    return (new_rem, new_src, new_prev), out


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_fast(p: BlockParams, inp, n):
    """Returns (A_freq [W_A], L_freq [W_L], states [S], emit-bitpack, words)."""
    inp_flat = inp.reshape(-1)
    if _F_FINDER == "scan":
        px = _search_params(p)
        inp_w32 = _pack_words(inp_flat)
        inp_pad = jnp.pad(inp, ((0, 0), (0, p.window + 1)))
        ts, take, src = _search_and_parse(px, inp_pad, inp_flat, inp_w32, n)
    else:
        ts, take, src = _fast_find_matches(p, inp_flat, n)

    carry0 = (
        jnp.zeros((p.lanes,), _i32),
        jnp.zeros((p.lanes,), _i32),
        jnp.ones((p.lanes,), _i32),
    )
    body = functools.partial(_replay_body, p, inp, n)
    _, ev = jax.lax.scan(body, carry0, (ts, take, src))
    (sym_a, act_a, sym_len, act_b, e_hi, b_hi, act_d, e_lo, b_lo,
     act_e) = ev

    # one histogram pass builds the block's static tables
    a_flat = jnp.where(act_a, sym_a, W_A).reshape(-1)
    a_freq_raw = jnp.zeros((W_A,), _i32).at[a_flat].add(1, mode="drop")
    l_flat = jnp.where(act_b, sym_len, W_L).reshape(-1)
    l_freq_raw = jnp.zeros((W_L,), _i32).at[l_flat].add(1, mode="drop")
    a_freq = normalize_freqs(a_freq_raw, W_A)
    l_freq = normalize_freqs(l_freq_raw, W_L)
    a_cums = tb.exclusive_cumsum(a_freq[None, :])[0]
    l_cums = tb.exclusive_cumsum(l_freq[None, :])[0]

    def cf_of(tab_c, tab_f, sym, act, width):
        oh = (
            jax.lax.broadcasted_iota(_i32, sym.shape + (width,), sym.ndim)
            == sym[..., None]
        )
        sel = jnp.stack([tab_c, tab_f], axis=-1).astype(jnp.float32)
        cf = jnp.dot(
            oh.reshape(-1, width).astype(jnp.float32), sel,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(_i32).reshape(sym.shape + (2,))
        return rans.select_cf(
            act, cf[..., 0].astype(_u32), cf[..., 1].astype(_u32)
        )

    ca, fa = cf_of(a_cums, a_freq, sym_a, act_a, W_A)
    cb, fb = cf_of(l_cums, l_freq, sym_len, act_b, W_L)
    fd = jnp.left_shift(jnp.uint32(1), (15 - b_hi).astype(_u32))
    cd, fdx = rans.select_cf(act_d, e_hi.astype(_u32) * fd, fd)
    fe = jnp.left_shift(jnp.uint32(1), (15 - b_lo).astype(_u32))
    ce, fex = rans.select_cf(act_e, e_lo.astype(_u32) * fe, fe)

    def rans_body(x, e):
        emits, wordss = [], []
        for cx, fx in reversed(list(zip(e[0::2], e[1::2]))):
            x, em, wd = rans.enc_put(x, cx, fx)
            emits.append(em)
            wordss.append(wd)
        return x, (jnp.stack(emits[::-1]), jnp.stack(wordss[::-1]))

    x = rans.init_states(p.lanes)
    x, (emit, words) = jax.lax.scan(
        rans_body, x, (ca, fa, cb, fb, cd, fdx, ce, fex), reverse=True
    )
    eb = emit.astype(jnp.uint8).reshape(p.steps, N_SLOTS, p.lanes // 8, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    emit_packed = jnp.sum(eb << shifts, axis=-1).astype(jnp.uint8)
    return a_freq, l_freq, x, emit_packed, words


def _fast_decode_body(p: BlockParams, stream, tabs, n, carry, t):
    rem, csrc, prev, x, base, out = carry
    a_freq, a_cums, l_freq, l_cums = tabs
    lanes = _lane_ids(p.lanes)
    pos = lanes * p.steps + t
    active = pos < n
    coding = active & (rem == 0)
    copying = active & (rem > 0)
    out_flat = out.reshape(-1)
    step_off = jnp.uint32(0)

    def advance(x, off, cx, fx):
        x_tmp, need = rans.dec_advance(x, cx, fx)
        win = jax.lax.dynamic_slice(
            stream, ((base + off).astype(_i32),), (p.lanes,)
        )
        w, used = rans.stream_window_read(win, need, jnp.uint32(0))
        return rans.dec_renorm(x_tmp, need, w), off + used

    # ---- A: literal byte | match-start(dist bucket) — static tables, so
    # tot == M and the raw (c, f) are already M-scale (no norm divide)
    slot = rans.dec_slot(x)
    rows_a = jnp.broadcast_to(a_freq, (p.lanes, W_A))
    cums_a = jnp.broadcast_to(a_cums, (p.lanes, W_A))
    sym_a, ca, fa = tb.find_symbol(rows_a, cums_a, slot.astype(_i32))
    ca, fa = rans.select_cf(coding, ca.astype(_u32), fa.astype(_u32))
    x, step_off = advance(x, step_off, ca, fa)
    is_match = coding & (sym_a >= 256)

    # ---- B: match length
    slot_b = rans.dec_slot(x)
    rows_l = jnp.broadcast_to(l_freq, (p.lanes, W_L))
    cums_l = jnp.broadcast_to(l_cums, (p.lanes, W_L))
    sym_l, cl, fl = tb.find_symbol(rows_l, cums_l, slot_b.astype(_i32))
    cl, fl = rans.select_cf(is_match, cl.astype(_u32), fl.astype(_u32))
    x, step_off = advance(x, step_off, cl, fl)

    # ---- D/E: distance mantissa (mode-'X' rule)
    k = jnp.clip(jnp.where(is_match, sym_a - 256, 0), 0, 24)
    repeat = is_match & (k == SYM_DST_REPEAT)
    k_dist = jnp.clip(jnp.where(repeat, 0, k), 0, 24)
    b_lo = jnp.minimum(k_dist, 12)
    b_hi = k_dist - b_lo
    has_extra = is_match & ~repeat
    act_d = has_extra & (b_hi > 0)
    fd = jnp.left_shift(jnp.uint32(1), (15 - b_hi).astype(_u32))
    e_hi = jnp.where(act_d, rans.dec_slot(x) // fd, 0).astype(_i32)
    cdx, fdx = rans.select_cf(act_d, e_hi.astype(_u32) * fd, fd)
    x, step_off = advance(x, step_off, cdx, fdx)
    act_e = has_extra & (b_lo > 0)
    fe = jnp.left_shift(jnp.uint32(1), (15 - b_lo).astype(_u32))
    e_lo = jnp.where(act_e, rans.dec_slot(x) // fe, 0).astype(_i32)
    cex, fex = rans.select_cf(act_e, e_lo.astype(_u32) * fe, fe)
    x, step_off = advance(x, step_off, cex, fex)
    dist_dec = (
        jnp.left_shift(jnp.ones_like(k_dist), k_dist)
        + jnp.left_shift(e_hi, b_lo)
        + e_lo
    )
    dist = jnp.where(repeat, prev, dist_dec)

    # ---- resolve the byte
    src = pos - dist
    gsrc = jnp.clip(
        jnp.where(is_match, src, csrc), 0, out_flat.shape[0] - 1
    )
    copied = out_flat[gsrc].astype(_i32)
    byte = jnp.where(is_match | copying, copied, jnp.clip(sym_a, 0, 255))

    # ---- state evolution
    length = sym_l + p.min_len
    new_rem = jnp.where(is_match, length - 1, jnp.maximum(rem - 1, 0))
    new_src = jnp.where(is_match, src + 1, csrc + 1)
    new_prev = jnp.where(is_match, dist, prev)
    col = jnp.where(active, byte, 0).astype(jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, col[:, None], (0, t))
    return (new_rem, new_src, new_prev, x, base + step_off, out), None


@functools.partial(jax.jit, static_argnums=(0,))
def _fast_decode_scan(p: BlockParams, a_freq, l_freq, states, stream, n):
    a_cums = tb.exclusive_cumsum(a_freq[None, :])[0]
    l_cums = tb.exclusive_cumsum(l_freq[None, :])[0]
    carry = (
        jnp.zeros((p.lanes,), _i32),
        jnp.zeros((p.lanes,), _i32),
        jnp.ones((p.lanes,), _i32),
        states,
        jnp.uint32(0),
        jnp.zeros((p.lanes, p.steps), jnp.uint8),
    )
    body = functools.partial(
        _fast_decode_body, p, stream, (a_freq, a_cums, l_freq, l_cums), n
    )
    # NOT unrolled: chaining 4 sub-steps per scan iteration measured
    # SLOWER (8.3 -> 5-7 MB/s on-chip) — the enlarged body's live-value
    # pressure outweighs the saved loop overhead.  (PERF.md round 3.)
    (_, _, _, x, base, out), _ = jax.lax.scan(
        body, carry, jnp.arange(p.steps, dtype=_i32)
    )
    return x, base, out


# --------------------------------------------------------------------------
# Host-facing API (mirrors block.py encode_block/decode_block)
# --------------------------------------------------------------------------

_TAB_BYTES = 2 * (W_A + W_L)


# ---- single-chip block batching (the mode-F counterpart of
# parallel/mesh.py's vmap path; payloads bit-identical to sequential) ----


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_fast_vmap(p: BlockParams, inp, n):
    def one(blk, nn):
        return _encode_fast(p, blk, nn)

    return jax.vmap(one)(inp, n)


@functools.partial(jax.jit, static_argnums=(0,))
def _fast_decode_vmap(p: BlockParams, a_freq, l_freq, states, streams, n):
    def one(a, l, st, sm, nn):
        return _fast_decode_scan(p, a, l, st, sm, nn)

    return jax.vmap(one)(a_freq, l_freq, states, streams, n)


def encode_blocks_fast(
    blocks: list, p: BlockParams, group: int
) -> list:
    """Encode a list of blocks in vmap-batched groups of ``group``."""
    import zlib

    out = []
    for g in range(0, len(blocks), group):
        grp = blocks[g : g + group]
        buf = np.zeros((group, p.lanes, p.steps), np.uint8)
        ns = np.zeros((group,), np.int32)
        for i, blk in enumerate(grp):
            buf[i].reshape(-1)[: blk.size] = blk
            ns[i] = blk.size
        af, lf, states, emitp, words = map(
            np.asarray,
            _encode_fast_vmap(p, jnp.asarray(buf), jnp.asarray(ns)),
        )
        emit = np.unpackbits(emitp, axis=-1, bitorder="little").astype(
            bool
        )
        for i, blk in enumerate(grp):
            stream = words[i][emit[i]]
            crc = zlib.crc32(blk.tobytes()) & 0xFFFFFFFF
            out.append(
                np.array([stream.size], np.uint32).tobytes()
                + np.array([crc], np.uint32).tobytes()
                + af[i].astype("<u2").tobytes()
                + lf[i].astype("<u2").tobytes()
                + states[i].astype("<u4").tobytes()
                + stream.astype("<u2").tobytes()
            )
    return out


def decode_blocks_fast(
    payloads: list, ns: list, p: BlockParams, group: int
) -> np.ndarray:
    """Decode F-block payloads in vmap-batched groups; validates each
    block's drain, stream count and content CRC like decode_block_fast."""
    import zlib

    nblk = len(payloads)
    npad = -(-max(nblk, 1) // group) * group
    a_freq = np.zeros((npad, W_A), np.int32)
    a_freq[:, 0] = M  # valid dummy tables for padded blocks
    l_freq = np.zeros((npad, W_L), np.int32)
    l_freq[:, 0] = M
    states = np.full((npad, p.lanes), RANS_L, np.uint32)
    streams = np.zeros((npad, p.stream_pad), np.uint16)
    n_arr = np.zeros((npad,), np.int32)
    n_words = np.zeros((npad,), np.int64)
    crcs = np.zeros((npad,), np.uint32)
    need = 8 + _TAB_BYTES + 4 * p.lanes
    for b, payload in enumerate(payloads):
        if ns[b] <= 0 or ns[b] > p.capacity or len(payload) < need:
            raise ValueError("corrupt block: bad fast-block payload")
        (nw,) = np.frombuffer(payload[:4], "<u4")
        (crcs[b],) = np.frombuffer(payload[4:8], "<u4")
        off = 8
        a_freq[b] = np.frombuffer(payload[off : off + 2 * W_A], "<u2")
        off += 2 * W_A
        l_freq[b] = np.frombuffer(payload[off : off + 2 * W_L], "<u2")
        off += 2 * W_L
        if int(a_freq[b].sum()) != M or int(l_freq[b].sum()) != M:
            raise ValueError("corrupt block: static table sums != M")
        states[b] = np.frombuffer(payload[off : off + 4 * p.lanes], "<u4")
        off += 4 * p.lanes
        words = np.frombuffer(payload[off : off + 2 * int(nw)], "<u2")
        if words.size != nw or int(nw) > p.stream_pad:
            raise ValueError("corrupt block: stream exceeds geometry bound")
        streams[b, : int(nw)] = words
        n_arr[b] = ns[b]
        n_words[b] = nw
    pieces = []
    for g in range(0, npad, group):
        sl = slice(g, g + group)
        x, base, outg = map(
            np.asarray,
            _fast_decode_vmap(
                p,
                jnp.asarray(a_freq[sl]),
                jnp.asarray(l_freq[sl]),
                jnp.asarray(states[sl]),
                jnp.asarray(streams[sl]),
                jnp.asarray(n_arr[sl]),
            ),
        )
        for i in range(group):
            b = g + i
            if b >= nblk:
                continue
            if int(base[i]) != n_words[b] or not (x[i] == RANS_L).all():
                raise ValueError(f"corrupt block {b}: drain check failed")
            res = outg[i].reshape(-1)[: ns[b]]
            if (zlib.crc32(res.tobytes()) & 0xFFFFFFFF) != int(crcs[b]):
                raise ValueError(f"corrupt block {b}: content CRC mismatch")
            pieces.append(res)
    return np.concatenate(pieces) if pieces else np.zeros(0, np.uint8)


def encode_block_fast_start(data: np.ndarray, p: BlockParams):
    """Dispatch the fast-profile encode (async device handles); pair with
    encode_block_fast_finish — same pipelining contract as
    block.encode_block_start."""
    n = int(data.size)
    assert 0 < n <= p.capacity
    buf = np.zeros((p.lanes, p.steps), np.uint8)
    buf.reshape(-1)[:n] = data
    # content CRC: the adaptive codecs detect payload corruption through
    # model-state divergence (the drain check fires), but static tables
    # cannot self-corrupt — a flipped distance-mantissa bit decodes to a
    # valid stream with wrong bytes.  The CRC is F's corruption detector.
    import zlib

    crc = zlib.crc32(data.tobytes()) & 0xFFFFFFFF
    return crc, _encode_fast(p, jnp.asarray(buf), jnp.int32(n))


def encode_block_fast_finish(started) -> bytes:
    crc, (a_freq, l_freq, states, emit_packed, words) = started
    emit_np = np.unpackbits(
        np.asarray(emit_packed), axis=-1, bitorder="little"
    ).astype(bool)
    stream = np.asarray(words)[emit_np]
    return (
        np.array([stream.size], np.uint32).tobytes()
        + np.array([crc], np.uint32).tobytes()
        + np.asarray(a_freq).astype("<u2").tobytes()
        + np.asarray(l_freq).astype("<u2").tobytes()
        + np.asarray(states).astype("<u4").tobytes()
        + stream.astype("<u2").tobytes()
    )


def encode_block_fast(data: np.ndarray, p: BlockParams) -> bytes:
    return encode_block_fast_finish(encode_block_fast_start(data, p))


def decode_block_fast_start(payload: bytes, n: int, p: BlockParams):
    """Host-side unpack + async scan dispatch; pair with
    decode_block_fast_finish (pipelining contract as decode_block_start).
    All payload-shape validation raises HERE, before dispatch."""
    if n <= 0 or n > p.capacity:
        raise ValueError(f"corrupt block: bad raw size {n}")
    need = 8 + _TAB_BYTES + 4 * p.lanes
    if len(payload) < need:
        raise ValueError("corrupt block: truncated fast-block payload")
    (n_words,) = np.frombuffer(payload[:4], "<u4")
    (crc_want,) = np.frombuffer(payload[4:8], "<u4")
    off = 8
    a_freq = np.frombuffer(payload[off : off + 2 * W_A], "<u2").astype(
        np.int32
    )
    off += 2 * W_A
    l_freq = np.frombuffer(payload[off : off + 2 * W_L], "<u2").astype(
        np.int32
    )
    off += 2 * W_L
    # table validation: static tables ride uncoded; a corrupt table must
    # fail clean here, not decode to garbage
    if int(a_freq.sum()) != M or int(l_freq.sum()) != M:
        raise ValueError("corrupt block: static table sums != M")
    states = np.frombuffer(payload[off : off + 4 * p.lanes], "<u4")
    off += 4 * p.lanes
    words = np.frombuffer(payload[off : off + 2 * int(n_words)], "<u2")
    if words.size != n_words or int(n_words) > p.stream_pad_max:
        raise ValueError("corrupt block: truncated stream")
    stream = np.zeros((p.stream_pad,), np.uint16)
    if int(n_words) > p.stream_pad:
        raise ValueError("corrupt block: stream exceeds geometry bound")
    stream[: int(n_words)] = words
    handles = _fast_decode_scan(
        p,
        jnp.asarray(a_freq),
        jnp.asarray(l_freq),
        jnp.asarray(states.copy()),
        jnp.asarray(stream),
        jnp.int32(n),
    )
    return n, int(n_words), int(crc_want), handles


def decode_block_fast_finish(started) -> np.ndarray:
    n, n_words, crc_want, (x, base, out) = started
    x = np.asarray(x)
    if int(base) != n_words or not (x == RANS_L).all():
        raise ValueError(
            f"corrupt block: states drained={bool((x == RANS_L).all())} "
            f"words {int(base)}/{n_words}"
        )
    res = np.asarray(out).reshape(-1)[:n]
    import zlib

    if (zlib.crc32(res.tobytes()) & 0xFFFFFFFF) != crc_want:
        raise ValueError("corrupt block: content CRC mismatch")
    return res


def decode_block_fast(payload: bytes, n: int, p: BlockParams) -> np.ndarray:
    return decode_block_fast_finish(decode_block_fast_start(payload, n, p))
