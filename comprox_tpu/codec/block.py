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

LZP4_BITS = 20  # ctx-4 table width        (ref ropmain: 2^20, cr-matcher.c:35-49)
LZP8_BITS = 23  # ctx-8 table width        (ref ropmain: 2^24; 2^23 + verify)
LZP4_SIZE = 1 << LZP4_BITS
LZP8_SIZE = 1 << LZP8_BITS
_i32 = jnp.int32
_u32 = jnp.uint32


@dataclass(frozen=True)
class BlockParams:
    lanes: int = 256  # S
    steps: int = 4096  # T: block capacity = lanes * steps bytes
    match: bool = True  # enable the LZP match layer
    min_len: int = 4  # (ref ropmain match_min=4, cr-matcher.h:36)
    window: int = 250  # encoder match-length cap (<= 255 + min_len)
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


def lzp_hash4(ctx4):
    """Multiplicative hash of the last 4 bytes -> ctx-4 bucket."""
    v = ctx4.astype(_u32) * _u32(2654435761)
    return ((v >> 12) & _u32(LZP4_SIZE - 1)).astype(_i32)


def lzp_hash8(ctx4, ctx4b):
    """Hash of the last 8 bytes (two packed u32 words) -> ctx-8 bucket.

    The high-precision table of the LZP ladder (ropmain/cr-matcher.c:59-73
    picks the longest-context table first; we keep 8 -> 4)."""
    v = ctx4.astype(_u32) * _u32(2654435761) ^ ctx4b.astype(_u32) * _u32(
        0x9E3779B1
    )
    return ((v >> 10) & _u32(LZP8_SIZE - 1)).astype(_i32)


def _lane_ids(s):
    return jax.lax.broadcasted_iota(_i32, (s, 1), 0).reshape(s)


def _init_carry(p: BlockParams):
    return {
        "tables": ppm.init_tables(p.match, p.o3_bits),
        "lzp2": jnp.zeros((1 << 16,), _i32),
        "lzp4": jnp.zeros((LZP4_SIZE,), _i32),
        "lzp8": jnp.zeros((LZP8_SIZE,), _i32),
        "ctx4": jnp.zeros((p.lanes,), _u32),  # last 4 bytes, newest low
        "ctx4b": jnp.zeros((p.lanes,), _u32),  # bytes -8..-5
        "copy_rem": jnp.zeros((p.lanes,), _i32),
        "copy_src": jnp.zeros((p.lanes,), _i32),
    }


def _lzp_candidate(c, t, p: BlockParams, hist_flat):
    """Deterministic match-source selection, identical on both sides:
    prefer the ctx-8 table's entry when present, causally readable
    (src % T < t, see the causality note in _encode_model_body) and
    context-verified, else the ctx-4 entry.

    Context verification (the reference's matcher_getpos check,
    ropmain/cr-matcher.c:59-73): the 8 bytes preceding src must equal the
    lane's own last 8 bytes, rejecting hash-collision mispredictions.
    ``hist_flat`` is the byte history — the input on encode, the decoded
    buffer on decode (equal by losslessness).  Verification only applies
    when src % T >= 8, so all compared bytes are causally available to the
    decoder; chunk-head sources are accepted unverified (rare).
    """
    s_lanes = c["ctx4"].shape[0]
    src8 = c["lzp8"][lzp_hash8(c["ctx4"], c["ctx4b"])] - 1
    src4 = c["lzp4"][lzp_hash4(c["ctx4"])] - 1
    src2 = c["lzp2"][(c["ctx4"] & 0xFFFF).astype(_i32)] - 1
    offs = jax.lax.broadcasted_iota(_i32, (s_lanes, 8), 1)
    sh = (7 - offs) * 8  # newest byte (src-1) sits in ctx4 low bits
    want_packed = jnp.where(offs < 4, c["ctx4b"][:, None], c["ctx4"][:, None])
    want = (want_packed >> (sh % 32)) & 0xFF

    def verified(src, k, t_min):
        """Causal + content-verified candidate (compare k bytes before src
        against the lane's own last k bytes).  Chunk-head sources
        (src % T < k) can't be verified causally and are accepted as-is."""
        ok = (src >= 0) & ((src % p.steps) < t) & (t >= t_min)
        verifiable = ok & ((src % p.steps) >= k)
        base = jnp.maximum(src - k, 0)
        idx = jnp.clip(
            base[:, None] + offs[:, 8 - k :] - (8 - k),
            0,
            hist_flat.shape[0] - 1,
        )
        got = hist_flat[idx]
        eq = jnp.all(got.astype(_u32) == want[:, 8 - k :], axis=1)
        return ok & (eq | ~verifiable)

    ok8 = verified(src8, 8, 8)
    ok4 = verified(src4, 4, 4)
    # ctx2 is an exact 2-byte index (no hash, no verify needed;
    # ropmain/cr-matcher.c M_hash2_ is the identity too)
    ok2 = (src2 >= 0) & ((src2 % p.steps) < t) & (t >= 2)
    src = jnp.where(ok8, src8, jnp.where(ok4, src4, src2))
    return src, ok8 | ok4 | ok2


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
    ctx4bn = jnp.where(
        active, (c["ctx4b"] << 8) | (c["ctx4"] >> 24), c["ctx4b"]
    )
    # insert context-for-position pos+1 -> pos+1 (stored +1; scatter-max so
    # the most recent position wins collisions deterministically)
    ins2 = active & (t >= 1) & (t != p.steps - 1) & (pos + 1 < n)
    ins4 = ins2 & (t >= 3)
    ins8 = ins4 & (t >= 7)
    lzp2 = c["lzp2"].at[
        jnp.where(ins2, (ctx4n & 0xFFFF).astype(_i32), 1 << 16)
    ].max(pos + 2, mode="drop")
    lzp4 = c["lzp4"].at[
        jnp.where(ins4, lzp_hash4(ctx4n), LZP4_SIZE)
    ].max(pos + 2, mode="drop")
    lzp8 = c["lzp8"].at[
        jnp.where(ins8, lzp_hash8(ctx4n, ctx4bn), LZP8_SIZE)
    ].max(pos + 2, mode="drop")
    return {
        **c,
        "lzp2": lzp2,
        "lzp4": lzp4,
        "lzp8": lzp8,
        "ctx4": ctx4n,
        "ctx4b": ctx4bn,
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

    # ---- match decision (encoder length policy is free; the SOURCE comes
    # from the shared deterministic rule the decoder replays)
    if p.match:
        # Causality (enforced in _lzp_candidate): an entry inserted at step
        # s names a position decoded at step s+1; a reader at step t gathers
        # BEFORE this step's column write, so the source must satisfy
        # decode-step(src) = src % T < t (this also rejects self-matches).
        # Then byte src+k is decoded at step (src % T)+k (or earlier if it
        # wraps into the next chunk), strictly before it is copied at t+k.
        src, ok = _lzp_candidate(c, t, p, inp_flat)
        valid = coding & ok
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
        sym_a.astype(jnp.int16),
        jnp.where(is_match, length, 0).astype(jnp.int16),
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
    ca, fa, act_a, cb, fb, act_b, sym_a, mlen = ev

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
    return x, emit, words, (ca, fa, act_a, cb, fb, act_b, sym_a, mlen)


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
    src, _ok = _lzp_candidate(c, t, p, out_flat)
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
    states, emit, words, _ = _encode_passes(p, jnp.asarray(buf), jnp.int32(n))
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


def encode_block_stats(data: np.ndarray, p: BlockParams) -> dict:
    """Encode + per-event-class bit accounting (ratio diagnostics)."""
    n = int(data.size)
    buf = np.zeros((p.lanes, p.steps), np.uint8)
    buf.reshape(-1)[:n] = data
    _, emit, words, dbg = _encode_passes(p, jnp.asarray(buf), jnp.int32(n))
    ca, fa, act_a, cb, fb, act_b, sym_a, mlen = map(np.asarray, dbg)
    act_a = act_a.astype(bool)
    act_b = act_b.astype(bool)
    bits_a = np.where(act_a, 15.0 - np.log2(np.maximum(fa, 1)), 0.0)
    bits_b = np.where(act_b, 15.0 - np.log2(np.maximum(fb, 1)), 0.0)
    is_lit = act_a & (sym_a < 256)
    is_hit = act_a & (sym_a == ppm.SYM_HIT)
    is_esc = act_a & (sym_a == ppm.SYM_ESC)
    is_mat = act_a & (sym_a == ppm.SYM_MATCH)
    mbytes = int(mlen.sum())
    stats = {
        "n": n,
        "coded_steps": int(act_a.sum()),
        "literals": int(is_lit.sum()),
        "o3_hits": int(is_hit.sum()),
        "escapes": int(is_esc.sum()),
        "matches": int(is_mat.sum()),
        "match_bytes": mbytes,
        "avg_match_len": mbytes / max(int(is_mat.sum()), 1),
        "bits_lit": float(bits_a[is_lit].sum()),
        "bits_hit": float(bits_a[is_hit].sum()),
        "bits_esc_flag": float(bits_a[is_esc].sum()),
        "bits_esc_lit": float(bits_b[act_b & is_esc].sum()),
        "bits_match_flag": float(bits_a[is_mat].sum()),
        "bits_match_len": float(bits_b[act_b & is_mat].sum()),
        "stream_words": int(np.asarray(emit).sum()),
    }
    total_bits = sum(v for k, v in stats.items() if k.startswith("bits_"))
    stats["model_bpb"] = total_bits / max(n, 1)
    stats["real_bpb"] = (stats["stream_words"] * 16 + p.lanes * 32) / max(n, 1)
    return stats


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
