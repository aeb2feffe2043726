"""Batched PPM compound model — o1 + o2 + o3-predictor, S lanes in lock-step.

TPU re-architecture of the reference literal coder (/root/reference/src/
cr-ppm.c:103-235 and cr-o2model.c): the per-context freq tables become HBM
arrays indexed by every lane's own context, advanced once per step for all S
lanes with deterministic batched updates (see models/tables.py for the
collision rules).

Symbol space of the primary ("A") event, coded under the order-2 context
(prev 2 bytes), mirrors the reference's 258-symbol alphabet plus one
TPU-native extension:

    0..255  literal byte            (cr-o2model.c slots 0-255)
    256     o3 predictor matched    (cr-ppm.c:118-125)
    257     escape to order-1       (cr-ppm.c:140-158)
    258     match-flag              (replaces the reference's rarest-byte
                                     escape trick, roxmain/cr-coder.c:180-189:
                                     a proper context-modeled symbol instead)
    259     padding (never coded)

The predicted byte's o2 frequency is excluded from the A distribution exactly
as in cr-ppm.c:118-138 (we zero its slot, which equals the reference's
cum/sum subtraction).  On escape, the literal is coded in the order-1 table
with weight 8*f-7 (cr-ppm.c:98) excluding the predicted byte and every byte
present in o2 (cr-ppm.c:140-158).  Match lengths are coded by a shared
adaptive order-0 table ("B" event of match lanes).

The o3 predictor keeps (pred byte, 4-bit confidence) per 22-bit hashed order-3
context (cr-ppm.c:36-41,66-88), packed conf<<8|pred into one int32 lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from comprox_tpu.models import tables as tb

# --- symbol space -----------------------------------------------------------
O2_W = 260
SYM_HIT = 256
SYM_ESC = 257
SYM_MATCH = 258

# --- tuning constants (ours; reference analogues noted) ---------------------
# overridable via CPX_* env vars for ratio sweeps (read at import time)
import os as _os


def _env(name, default):
    return int(_os.environ.get("CPX_" + name, default))


INC2 = _env("INC2", 16)  # o2 increment   (ref: 1 on u8 tables, cr-ppm.c)
CAP2 = _env("CAP2", 24576)  # o2 read-time sum cap (ref: freq 250/symbol)
INC1 = _env("INC1", 1)  # o1 increment    (ref: 1, cr-ppm.c:92)
CAP1 = _env("CAP1", 3500)  # o1 raw-sum cap; weighted 8*f-7 stays < 2^15
LEN_INC = _env("LEN_INC", 16)
LEN_CAP = 24576
IDX_INC = _env("IDX_INC", 16)  # ROLZ index model (ref: 4, cr-coder.c:282)
IDX_CAP = 24576
DST_INC = _env("DST_INC", 16)  # LZ77 distance-bucket model (~roxmain's
DST_CAP = 24576  # chained pos_models, roxmain/cr-coder.c:242-258)
DST_W = 32  # buckets 0..23 = bit_length(dist)-1, 24 = repeat-prev
IDX_W = 64
O2_NCTX = 1 << 16
O1_NCTX = 256
O3_SIZE = 1 << 22
LEN_W = 256

_i32 = jnp.int32

_STICKY2 = jnp.zeros((O2_W,), bool).at[SYM_HIT].set(True).at[SYM_ESC].set(
    True
).at[SYM_MATCH].set(True)
_STICKY_ALL = jnp.ones((1,), bool)  # broadcast: ceil-halve every slot


def init_tables(match_enabled: bool, o3_bits: int = 22) -> dict:
    """Fresh model state for one block (per-block reset, SURVEY.md §5)."""
    o2_row = jnp.zeros((O2_W,), _i32)
    o2_row = o2_row.at[SYM_HIT].set(INC2).at[SYM_ESC].set(INC2)
    if match_enabled:
        o2_row = o2_row.at[SYM_MATCH].set(INC2)
    o3_size = 1 << o3_bits
    return {
        "o2": tb.make_table(O2_NCTX, O2_W, o2_row),
        "o1": tb.make_table(O1_NCTX, O1_NCTX, jnp.ones((O1_NCTX,), _i32)),
        "o3": jnp.zeros((o3_size,), _i32),  # conf<<8 | pred, init pred=0 conf=0
        "len": tb.make_table(1, LEN_W, jnp.ones((LEN_W,), _i32)),
        "idx": tb.make_table(1, IDX_W, jnp.ones((IDX_W,), _i32)),
        "dst": tb.make_table(1, DST_W, jnp.ones((DST_W,), _i32)),
    }


def o3_hash(ctx3, o3_size: int):
    """Order-3 context hash (shape of cr-ppm.c:66; 22-bit in production)."""
    return (ctx3 ^ (ctx3 >> 2)) & jnp.int32(o3_size - 1)


def o3_read(t, h3):
    packed = t["o3"][h3]
    return packed & 0xFF, packed >> 8  # (pred, conf)


def read_o2(t, ctx2, pred, coding):
    """Gather + rescale + exclude-predicted for the A event.

    Returns (tables', rowmod, cums, tot).  ``rowmod`` has the predicted
    byte's slot zeroed; escape slot is clamped >= 1 read-locally (it can be
    driven negative by escape elimination).
    """
    rows = t["o2"][ctx2]
    rows, did = tb.rescale_read(rows, CAP2, _STICKY2)
    t = dict(t)
    t["o2"] = tb.write_rows_dedup(t["o2"], ctx2, rows, did & coding)
    esc = jnp.maximum(rows[:, SYM_ESC], 1)
    rows = rows.at[:, SYM_ESC].set(esc)
    slot_ids = jax.lax.broadcasted_iota(_i32, rows.shape, 1)
    rowmod = jnp.where(slot_ids == pred[:, None], 0, rows)
    cums = tb.exclusive_cumsum(rowmod)
    return t, rows, rowmod, cums, tb.row_total(rowmod)


def read_o1_excl(t, p1, o2_rows, pred, esc_mask):
    """Order-1 weighted distribution with o2/pred exclusion (B event of
    escape lanes).  Returns (tables', wmod, cums, tot)."""
    rows = t["o1"][p1]
    rows, did = tb.rescale_read(rows, CAP1, _STICKY_ALL)
    t = dict(t)
    t["o1"] = tb.write_rows_dedup(t["o1"], p1, rows, did & esc_mask)
    w = rows * 8 - 7  # cr-ppm.c:98 M_freq_o1
    slot_ids = jax.lax.broadcasted_iota(_i32, rows.shape, 1)
    excluded = (o2_rows[:, :256] > 0) | (slot_ids == pred[:, None])
    wmod = jnp.where(excluded, 0, w)
    cums = tb.exclusive_cumsum(wmod)
    return t, rows, wmod, cums, tb.row_total(wmod)


def read_len(t, match_mask):
    """Shared match-length distribution (C event of match lanes)."""
    return _read_shared(t, match_mask, "len", LEN_CAP)


def read_idx(t, match_mask):
    """Shared ROLZ bucket-index distribution (B event of match lanes;
    the analogue of rolzmain's idx_model, cr-coder.c:214-226)."""
    return _read_shared(t, match_mask, "idx", IDX_CAP)


def read_dst(t, match_mask):
    """Shared LZ77 distance-bucket distribution (B event of match lanes in
    mode 'X'; the analogue of roxmain's chained pos_models)."""
    return _read_shared(t, match_mask, "dst", DST_CAP)


def _read_shared(t, mask, key, cap):
    zeros = jnp.zeros_like(mask, _i32)
    rows = t[key][zeros]
    rows, did = tb.rescale_read(rows, cap, _STICKY_ALL)
    t = dict(t)
    t[key] = tb.write_rows_dedup(t[key], zeros, rows, did & mask)
    cums = tb.exclusive_cumsum(rows)
    return t, rows, cums, tb.row_total(rows)


def apply_updates(
    t,
    coding,
    ctx2,
    sym_a,
    byte,
    old_f_byte,
    p1,
    h3,
    pred,
    conf,
    sym_len,
    sym_idx=None,
    sym_dst=None,
):
    """All model updates for one step, after both events are coded.

    ``coding`` masks lanes that coded an A event this step.  Classification
    is derived from ``sym_a``; ``byte`` is the resolved literal for lit/esc
    lanes.  ``old_f_byte`` is the byte's pre-update o2 frequency (drives the
    escape eliminator, cr-ppm.c:128-139).
    """
    is_lit = coding & (sym_a < 256)
    is_hit = coding & (sym_a == SYM_HIT)
    is_esc = coding & (sym_a == SYM_ESC)
    is_match = coding & (sym_a == SYM_MATCH)
    t = dict(t)

    # --- o2: one fused 3-way scatter-add ------------------------------------
    # (a) the coded A symbol; (b) the escaped literal also learns into o2
    #     (cr-ppm.c:151-153); (c) escape elimination: a literal's second
    #     occurrence decrements the escape slot (cr-ppm.c:128-139).
    eliminate = is_lit & (old_f_byte == INC2)
    idx_ctx = jnp.concatenate([ctx2, ctx2, ctx2])
    idx_sym = jnp.concatenate(
        [sym_a, byte, jnp.full_like(sym_a, SYM_ESC)]
    )
    deltas = jnp.concatenate(
        [
            jnp.where(coding, INC2, 0),
            jnp.where(is_esc, INC2, 0),
            jnp.where(eliminate, -INC2, 0),
        ]
    )
    t["o2"] = t["o2"].at[idx_ctx, idx_sym].add(deltas, mode="drop")

    # --- o1: escaped literals ----------------------------------------------
    t["o1"] = tb.scatter_add(t["o1"], p1, byte, INC1, is_esc)

    # --- len / idx: match side models ---------------------------------------
    zeros = jnp.zeros_like(sym_len)
    t["len"] = tb.scatter_add(t["len"], zeros, sym_len, LEN_INC, is_match)
    if sym_idx is not None:
        t["idx"] = tb.scatter_add(t["idx"], zeros, sym_idx, IDX_INC, is_match)
    if sym_dst is not None:
        t["dst"] = tb.scatter_add(t["dst"], zeros, sym_dst, DST_INC, is_match)

    # --- o3 predictor: hit strengthens, miss decays/replaces ----------------
    # (cr-ppm.c:69-88; matches don't touch o3)
    o3_upd = is_hit | is_lit | is_esc
    nc = (
        (conf > 1).astype(_i32)
        + (conf > 2).astype(_i32)
        + (conf > 4).astype(_i32)
        + (conf > 8).astype(_i32)
    )
    new_pred = jnp.where(is_hit | (nc > 0), pred, byte)
    new_conf = jnp.where(
        is_hit, jnp.minimum(conf + 1, 15), jnp.maximum(nc, 1)
    )
    packed = (new_conf << 8) | new_pred
    winners = tb.elect_winners(h3, o3_upd)
    safe_h = jnp.where(winners, h3, t["o3"].shape[0])
    t["o3"] = t["o3"].at[safe_h].set(packed, mode="drop")
    return t
