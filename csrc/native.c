/* comprox_tpu native runtime helpers.
 *
 * Host-side hot loops that are inherently sequential or branchy and thus
 * belong in native code rather than on the TPU: the x86 E8/E9 call-target
 * transform (sequential 4-byte operand skip), dictionary substitution
 * loops, and stream compaction.  Mirrors the role of the reference's C
 * runtime around its codec core (/root/reference/src/filter_x86opcode.h,
 * cr-diccode.c) — re-implemented from its documented behavior, not copied.
 *
 * Built lazily by comprox_tpu/utils/native.py with cc -O3 -shared; every
 * entry point has a pure-Python fallback.
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* x86 E8/E9 rel32 -> abs32 transform over buf[0..len), treating the region
 * as starting at virtual offset vbase within an image of size vsize.
 * Invertible by construction: encoded operands land in [0, vsize) for
 * in-image targets or (-vsize, 0) for the wrap class; decode reverses by
 * sign.  Opcode bytes are never modified, so both directions take identical
 * skip decisions.  en_de: 0 = encode, 1 = decode.
 */
void e8e9_transform(uint8_t *buf, int64_t len, int64_t vbase, int64_t vsize,
                    int en_de) {
    int64_t i = 0;
    if (len < 9) return;
    while (i < len - 8) {
        if ((buf[i++] & 0xFE) == 0xE8) {
            int32_t op;
            memcpy(&op, buf + i, 4);
            int64_t here = vbase + i;
            if (en_de == 0) {
                if (op >= -here && op < vsize - here) {
                    op = (int32_t)(op + here);
                } else if (op > 0 && op < vsize) {
                    op = (int32_t)(op - vsize);
                }
            } else {
                if (op < 0) {
                    if (op + here >= 0) op = (int32_t)(op + vsize);
                } else if (op < vsize) {
                    op = (int32_t)(op - here);
                }
            }
            memcpy(buf + i, &op, 4);
            i += 4;
        }
    }
}

/* Greedy min-gap-5 selection of E8/E9 opcode positions (the skip rule
 * above), exported separately for the vectorized JAX transform path:
 * returns number of active positions written to out. */
int64_t e8e9_active_positions(const uint8_t *buf, int64_t len,
                              int64_t *out) {
    int64_t i = 0, n = 0;
    if (len < 9) return 0;
    while (i < len - 8) {
        if ((buf[i] & 0xFE) == 0xE8) {
            out[n++] = i;
            i += 5;
        } else {
            i += 1;
        }
    }
    return n;
}
