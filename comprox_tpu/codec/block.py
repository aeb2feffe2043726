"""Block codec: S lock-step lanes over one block, LZP match + PPM + rANS.

TPU re-architecture of the reference codec cores (/root/reference/src/
{rox,rolz,rop}main/cr-coder.c).  The reference runs ONE sequential symbol
loop with helper pthreads; here a block of n bytes is split into S contiguous
equal chunks ("lanes"), and all lanes advance **one byte per step** in
lock-step:

    position(lane, step) = lane * T + step,   T = ceil(n / S)

Every per-symbol structure becomes a vector over lanes: model contexts, rANS
states, match/copy state.  Model tables and the LZP hash table are *shared*
across lanes and updated deterministically once per step (models/tables.py),
so the models see the whole block's statistics — lanes cost no cold-start.

Match layer (codec 'P' — the LZP form, ropmain/cr-matcher.c re-expressed):
a shared 2^20-entry hash table maps hash(previous 4 bytes) -> position+1.
A lane signals a match with A-symbol 258, codes the length as a B event, and
then *copies one byte per step* for L-1 further steps.  Copy causality holds
because a table entry inserted at step s is only ever read at steps > s, and
byte k of its source is decoded at step <= s+k < t+k (see SURVEY.md §7 hard
part 4: this design resolves decode-side match copies without a serial loop).

Encode is two passes (rANS is LIFO): pass 1 = forward modeling scan emitting
normalized (c, f) events per (step, slot, lane); pass 2 = backward rANS scan
emitting stream words.  Decode is one forward scan fusing modeling + rANS.
Both sides share the model read/update functions, which is what makes the
table evolution bit-identical.

Events per step per lane: slot A (PPM symbol: literal/o3-hit/escape/match
flag) and slot B (escaped-literal in o1, or match length).  Stream word
order = (step, slot, lane), ascending.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from comprox_tpu.models import ppm
from comprox_tpu.models import tables as tb
from comprox_tpu.ops import rans
from comprox_tpu.ops.rans_scalar import RANS_L

LZP_BITS = 20
LZP_SIZE = 1 << LZP_BITS
_i32 = jnp.int32
_u32 = jnp.uint32


@dataclass(frozen=True)
class BlockParams:
    lanes: int = 256  # S
    steps: int = 4096  # T: block capacity = lanes * steps bytes
    match: bool = True  # enable the LZP match layer
    min_len: int = 6
    window: int = 64  # encoder match-length cap (<= 255 + min_len)
    o3_bits: int = 22  # o3 predictor hash width (ref: 22, cr-ppm.h:39)

    @property
    def capacity(self) -> int:
        return self.lanes * self.steps

    @property
    def stream_pad(self) -> int:
        # the stored-block fallback guarantees container payloads are
        # smaller than the raw block, so their word streams fit in
        # capacity/2 words; a fixed pad keeps decode at ONE compilation
        # per geometry
        return self.capacity // 2 + 16

    @property
    def stream_pad_max(self) -> int:
        # absolute worst case: 2 events/byte, <=1 word/event (for raw
        # decode_block calls on adversarial payloads, bypassing the
        # container's stored fallback)
        return 2 * self.capacity + 16


def lzp_hash(ctx4):
    """Multiplicative hash of the last 4 bytes -> LZP_BITS bucket."""
    v = ctx4.astype(_u32) * _u32(2654435761)
    return ((v >> 12) & _u32(LZP_SIZE - 1)).astype(_i32)


def _lane_ids(s):
    return jax.lax.broadcasted_iota(_i32, (s, 1), 0).reshape(s)


def _init_carry(p: BlockParams):
    return {
        "tables": ppm.init_tables(p.match, p.o3_bits),
        "lzp": jnp.zeros((LZP_SIZE,), _i32),
        "ctx4": jnp.zeros((p.lanes,), _u32),
        "copy_rem": jnp.zeros((p.lanes,), _i32),
        "copy_src": jnp.zeros((p.lanes,), _i32),
    }


def _common_reads(c, t, n, p: BlockParams):
    """Shared per-step context derivation for encode pass 1 and decode."""
    lanes = _lane_ids(p.lanes)
    pos = lanes * p.steps + t
    active = pos < n
    coding = active & (c["copy_rem"] == 0)
    copying = active & (c["copy_rem"] > 0)
    ctx4 = c["ctx4"]
    p1 = (ctx4 & 0xFF).astype(_i32)
    p2 = ((ctx4 >> 8) & 0xFF).astype(_i32)
    ctx2 = (p2 << 8) | p1
    ctx3 = (ctx4 & 0xFFFFFF).astype(_i32)
    h3 = ppm.o3_hash(ctx3, c["tables"]["o3"].shape[0])
    pred, conf = ppm.o3_read(c["tables"], h3)
    return lanes, pos, active, coding, copying, p1, ctx2, h3, pred, conf


def _post_step(c, t, n, p, pos, active, byte, is_match, src, sym_len):
    """Shared end-of-step state evolution: copy state, ctx4, LZP insert."""
    new_rem = jnp.where(
        is_match,
        sym_len + (p.min_len - 1),
        jnp.maximum(c["copy_rem"] - 1, 0),
    )
    new_src = jnp.where(is_match, src + 1, c["copy_src"] + 1)
    ctx4n = jnp.where(active, (c["ctx4"] << 8) | byte.astype(_u32), c["ctx4"])
    # insert context-for-position pos+1 -> pos+1 (stored +1; scatter-max so
    # the most recent position wins collisions deterministically)
    ins = active & (t >= 3) & (t != p.steps - 1) & (pos + 1 < n)
    h_next = lzp_hash(ctx4n)
    safe_h = jnp.where(ins, h_next, LZP_SIZE)
    lzp = c["lzp"].at[safe_h].max(pos + 2, mode="drop")
    return {
        **c,
        "lzp": lzp,
        "ctx4": ctx4n,
        "copy_rem": new_rem,
        "copy_src": new_src,
    }


# --------------------------------------------------------------------------
# Encode pass 1: forward modeling scan -> normalized (c, f) event grids
# --------------------------------------------------------------------------


def _encode_model_body(p: BlockParams, inp, inp_flat, n, c, t):
    (lanes, pos, active, coding, copying, p1, ctx2, h3, pred, conf) = (
        _common_reads(c, t, n, p)
    )
    byte = jax.lax.dynamic_slice(inp, (0, t), (p.lanes, 1)).reshape(p.lanes)
    byte = byte.astype(_i32)

    # ---- match decision (encoder policy; free choice, decoder just obeys)
    if p.match:
        h4 = lzp_hash(c["ctx4"])
        src = c["lzp"][h4] - 1
        # Causality: an entry inserted at step s names a position decoded at
        # step s+1; a reader at step t gathers BEFORE this step's column
        # write, so the source must satisfy decode-step(src) = src % T < t
        # (this also rejects self-matches).  Then byte src+k is decoded at
        # step (src % T)+k (or earlier if it wraps into the next chunk),
        # strictly before it is copied at step t+k.
        valid = coding & (src >= 0) & (t >= 4) & ((src % p.steps) < t)
        # compare windows via flat clamped gathers (may cross chunk ends)
        offs = jax.lax.broadcasted_iota(_i32, (p.lanes, p.window), 1)
        cur_idx = jnp.clip(pos[:, None] + offs, 0, inp_flat.shape[0] - 1)
        cand_idx = jnp.clip(
            jnp.maximum(src, 0)[:, None] + offs, 0, inp_flat.shape[0] - 1
        )
        eq = inp_flat[cur_idx] == inp_flat[cand_idx]
        run = jnp.cumprod(eq.astype(_i32), axis=-1)
        length = jnp.sum(run, axis=-1)
        cap = jnp.minimum(
            jnp.minimum(p.steps - t, n - pos), min(p.window, p.min_len + 255)
        )
        length = jnp.minimum(length, cap)
        do_match = valid & (length >= p.min_len)
    else:
        src = jnp.zeros((p.lanes,), _i32)
        length = jnp.zeros((p.lanes,), _i32)
        do_match = jnp.zeros((p.lanes,), bool)

    # ---- A event
    tbs, rows2, rowmod, cums_a, tot_a = ppm.read_o2(
        c["tables"], ctx2, pred, coding
    )
    f_byte = jnp.take_along_axis(rowmod, byte[:, None], axis=-1)[:, 0]
    sym_a = jnp.where(
        do_match,
        ppm.SYM_MATCH,
        jnp.where(
            byte == pred,
            ppm.SYM_HIT,
            jnp.where(f_byte > 0, byte, ppm.SYM_ESC),
        ),
    )
    ca_raw, fa_raw = tb.cum_frq_of(rowmod, cums_a, sym_a)
    ca, fa = rans.norm_cf(
        ca_raw, jnp.maximum(fa_raw, 1), jnp.maximum(tot_a, 1)
    )
    ca, fa = rans.select_cf(coding, ca, fa)

    is_hit = coding & (sym_a == ppm.SYM_HIT)
    is_esc = coding & (sym_a == ppm.SYM_ESC)
    is_match = coding & (sym_a == ppm.SYM_MATCH)

    # ---- B event: escaped literal (o1) or match length (len)
    tbs, rows1, wmod, cums1, tot1 = ppm.read_o1_excl(
        tbs, p1, rows2, pred, is_esc
    )
    c1_raw, f1_raw = tb.cum_frq_of(wmod, cums1, byte)
    sym_len = jnp.clip(length - p.min_len, 0, ppm.LEN_W - 1)
    tbs, rows_l, cums_l, tot_l = ppm.read_len(tbs, is_match)
    cl_raw, fl_raw = tb.cum_frq_of(rows_l, cums_l, sym_len)
    cb_raw = jnp.where(is_esc, c1_raw, cl_raw)
    fb_raw = jnp.where(is_esc, f1_raw, fl_raw)
    tot_b = jnp.where(is_esc, tot1, tot_l)
    act_b = is_esc | is_match
    cb, fb = rans.norm_cf(
        cb_raw, jnp.maximum(fb_raw, 1), jnp.maximum(tot_b, 1)
    )
    cb, fb = rans.select_cf(act_b, cb, fb)

    # ---- model updates + state evolution
    tbs = ppm.apply_updates(
        tbs, coding, ctx2, sym_a, byte, f_byte, p1, h3, pred, conf, sym_len
    )
    c = dict(c)
    c["tables"] = tbs
    c = _post_step(c, t, n, p, pos, active, byte, is_match, src, sym_len)
    out = (
        ca.astype(jnp.uint16),
        fa.astype(jnp.uint16),
        coding,
        cb.astype(jnp.uint16),
        fb.astype(jnp.uint16),
        act_b,
    )
    return c, out


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_passes(p: BlockParams, inp, n):
    """Pass 1 (modeling) + pass 2 (backward rANS).  Returns device arrays:
    (states [S] u32, emit [T,2,S] bool, words [T,2,S] u16)."""
    inp_flat = inp.reshape(-1)
    carry = _init_carry(p)
    body = functools.partial(_encode_model_body, p, inp, inp_flat, n)
    carry, ev = jax.lax.scan(body, carry, jnp.arange(p.steps, dtype=_i32))
    ca, fa, act_a, cb, fb, act_b = ev

    def rans_body(x, e):
        ca_t, fa_t, aa_t, cb_t, fb_t, ab_t = e
        # backward: B first, then A (decode does A then B)
        cb_v, fb_v = rans.select_cf(
            ab_t, cb_t.astype(_u32), jnp.maximum(fb_t, 1).astype(_u32)
        )
        x, emit_b, word_b = rans.enc_put(x, cb_v, fb_v)
        ca_v, fa_v = rans.select_cf(
            aa_t, ca_t.astype(_u32), jnp.maximum(fa_t, 1).astype(_u32)
        )
        x, emit_a, word_a = rans.enc_put(x, ca_v, fa_v)
        return x, (
            jnp.stack([emit_a, emit_b]),
            jnp.stack([word_a, word_b]),
        )

    x = rans.init_states(p.lanes)
    x, (emit, words) = jax.lax.scan(
        rans_body, x, (ca, fa, act_a, cb, fb, act_b), reverse=True
    )
    return x, emit, words


# --------------------------------------------------------------------------
# Decode: one forward scan fusing modeling + rANS + copy resolution
# --------------------------------------------------------------------------


def _decode_body(p: BlockParams, stream, n, carry, t):
    c, x, base, out = carry
    (lanes, pos, active, coding, copying, p1, ctx2, h3, pred, conf) = (
        _common_reads(c, t, n, p)
    )
    out_flat = out.reshape(-1)

    # ---- A event
    tbs, rows2, rowmod, cums_a, tot_a = ppm.read_o2(
        c["tables"], ctx2, pred, coding
    )
    slot = rans.dec_slot(x)
    tgt = rans.dec_target(slot, jnp.maximum(tot_a, 1))
    sym_a, ca_raw, fa_raw = tb.find_symbol(rowmod, cums_a, tgt.astype(_i32))
    ca, fa = rans.norm_cf(
        ca_raw, jnp.maximum(fa_raw, 1), jnp.maximum(tot_a, 1)
    )
    ca, fa = rans.select_cf(coding, ca, fa)
    x_tmp, need = rans.dec_advance(x, ca, fa)
    idx, base = rans.stream_positions(need, base)
    w = stream[jnp.minimum(idx, stream.shape[0] - 1)]
    x = rans.dec_renorm(x_tmp, need, w)

    is_hit = coding & (sym_a == ppm.SYM_HIT)
    is_esc = coding & (sym_a == ppm.SYM_ESC)
    is_match = coding & (sym_a == ppm.SYM_MATCH)
    is_lit = coding & (sym_a < 256)

    # ---- B event
    tbs, rows1, wmod, cums1, tot1 = ppm.read_o1_excl(
        tbs, p1, rows2, pred, is_esc
    )
    tbs, rows_l, cums_l, tot_l = ppm.read_len(tbs, is_match)
    slot_b = rans.dec_slot(x)
    tgt1 = rans.dec_target(slot_b, jnp.maximum(tot1, 1))
    sym1, c1_raw, f1_raw = tb.find_symbol(wmod, cums1, tgt1.astype(_i32))
    tgt_l = rans.dec_target(slot_b, jnp.maximum(tot_l, 1))
    sym_l, cl_raw, fl_raw = tb.find_symbol(rows_l, cums_l, tgt_l.astype(_i32))
    cb_raw = jnp.where(is_esc, c1_raw, cl_raw)
    fb_raw = jnp.where(is_esc, f1_raw, fl_raw)
    tot_b = jnp.where(is_esc, tot1, tot_l)
    act_b = is_esc | is_match
    cb, fb = rans.norm_cf(
        cb_raw, jnp.maximum(fb_raw, 1), jnp.maximum(tot_b, 1)
    )
    cb, fb = rans.select_cf(act_b, cb, fb)
    x_tmp, need = rans.dec_advance(x, cb, fb)
    idx, base = rans.stream_positions(need, base)
    w = stream[jnp.minimum(idx, stream.shape[0] - 1)]
    x = rans.dec_renorm(x_tmp, need, w)

    # ---- resolve the byte
    h4 = lzp_hash(c["ctx4"])
    src = c["lzp"][h4] - 1
    gsrc = jnp.clip(jnp.where(is_match, src, c["copy_src"]), 0, out_flat.shape[0] - 1)
    copied = out_flat[gsrc].astype(_i32)
    byte = jnp.where(is_lit, sym_a, 0)
    byte = jnp.where(is_hit, pred, byte)
    byte = jnp.where(is_esc, sym1, byte)
    byte = jnp.where(is_match | copying, copied, byte)
    byte = jnp.clip(byte, 0, 255)
    f_byte = jnp.where(is_lit, fa_raw, 0)  # eliminator only needs lit lanes

    # ---- updates + state evolution
    tbs = ppm.apply_updates(
        tbs, coding, ctx2, sym_a, byte, f_byte, p1, h3, pred, conf, sym_l
    )
    c = dict(c)
    c["tables"] = tbs
    sym_len_eff = jnp.where(is_match, sym_l, 0)
    c = _post_step(c, t, n, p, pos, active, byte, is_match, src, sym_len_eff)
    col = jnp.where(active, byte, 0).astype(jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, col[:, None], (0, t))
    return (c, x, base, out), None


@functools.partial(jax.jit, static_argnums=(0,))
def _decode_scan(p: BlockParams, states, stream, n):
    carry = (
        _init_carry(p),
        states,
        jnp.uint32(0),
        jnp.zeros((p.lanes, p.steps), jnp.uint8),
    )
    body = functools.partial(_decode_body, p, stream, n)
    (c, x, base, out), _ = jax.lax.scan(
        body, carry, jnp.arange(p.steps, dtype=_i32)
    )
    return x, base, out


# --------------------------------------------------------------------------
# Host-facing API
# --------------------------------------------------------------------------


def encode_block(data: np.ndarray, p: BlockParams) -> bytes:
    """Encode up to p.capacity bytes; returns the block payload."""
    n = int(data.size)
    assert 0 < n <= p.capacity
    buf = np.zeros((p.lanes, p.steps), np.uint8)
    buf.reshape(-1)[:n] = data
    states, emit, words = _encode_passes(p, jnp.asarray(buf), jnp.int32(n))
    emit_np = np.asarray(emit)  # [T, 2, S] in (step, slot, lane) order
    words_np = np.asarray(words)
    stream = words_np[emit_np]  # C-order compaction == decode read order
    states_np = np.asarray(states)
    header = np.array([stream.size], np.uint32)
    return (
        header.tobytes()
        + states_np.astype("<u4").tobytes()
        + stream.astype("<u2").tobytes()
    )


def decode_block(payload: bytes, n: int, p: BlockParams) -> np.ndarray:
    """Decode a block payload back to its n raw bytes."""
    n_words = int(np.frombuffer(payload[:4], "<u4")[0])
    off = 4
    states = np.frombuffer(payload[off : off + 4 * p.lanes], "<u4").copy()
    off += 4 * p.lanes
    stream = np.frombuffer(payload[off : off + 2 * n_words], "<u2").copy()
    pad = p.stream_pad if n_words <= p.stream_pad else p.stream_pad_max
    stream_padded = np.zeros(pad, np.uint16)
    stream_padded[:n_words] = stream
    x, base, out = _decode_scan(
        p, jnp.asarray(states), jnp.asarray(stream_padded), jnp.int32(n)
    )
    if int(base) != n_words or not bool((np.asarray(x) == RANS_L).all()):
        raise ValueError(
            f"corrupt block: consumed {int(base)}/{n_words} words, "
            f"states drained={bool((np.asarray(x) == RANS_L).all())}"
        )
    return np.asarray(out).reshape(-1)[:n]
