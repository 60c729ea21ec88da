/* Native CABAC slice-data codec — the production host-serial path.
 *
 * Mirrors kvazzup_tpu/entropy/{cabac,syntax,slice_data}.py bit-for-bit (the
 * Python modules remain the readable reference; tests assert byte equality).
 * This is the TPU build's counterpart of kvazaar's C entropy core
 * (Bitstream/CABAC groups, dependencies/kvazaar_CMakeLists.txt:207-218):
 * the one inherently bit-serial stage, kept on host while all pixel math
 * runs on device.
 *
 * Build: gcc -O2 -shared -fPIC slice_cabac.c -o libslice_cabac.so
 */

#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#include "cabac_tables.h"

/* ------------------------------------------------------------ bit writer */

typedef struct {
    uint8_t *buf;
    long cap;
    long nbits; /* bits written so far */
    int error;
} BitBuf;

static void put_bit_raw(BitBuf *b, int bit) {
    long byte = b->nbits >> 3;
    if (byte >= b->cap) { b->error = 1; return; }
    if ((b->nbits & 7) == 0) b->buf[byte] = 0;
    b->buf[byte] |= (uint8_t)(bit << (7 - (b->nbits & 7)));
    b->nbits++;
}

/* ------------------------------------------------------------ encoder */

typedef struct {
    uint32_t low, range;
    int bits_outstanding;
    int first_bit;
    uint8_t state[NUM_CONTEXTS];
    uint8_t mps[NUM_CONTEXTS];
    BitBuf out;
} CabacEnc;

static void ctx_init(uint8_t *state, uint8_t *mps, int init_type, int slice_qp) {
    const uint8_t *iv = init_type == 0 ? INIT_VALUES_0 : (init_type == 1 ? INIT_VALUES_1 : INIT_VALUES_2);
    int qp = slice_qp < 0 ? 0 : (slice_qp > 51 ? 51 : slice_qp);
    for (int i = 0; i < NUM_CONTEXTS; i++) {
        int slope = (iv[i] >> 4) * 5 - 45;
        int offset = ((iv[i] & 15) << 3) - 16;
        int pre = ((slope * qp) >> 4) + offset;
        if (pre < 1) pre = 1;
        if (pre > 126) pre = 126;
        if (pre <= 63) { state[i] = (uint8_t)(63 - pre); mps[i] = 0; }
        else { state[i] = (uint8_t)(pre - 64); mps[i] = 1; }
    }
}

static void enc_init(CabacEnc *e, int init_type, int slice_qp, uint8_t *buf, long cap) {
    e->low = 0; e->range = 510; e->bits_outstanding = 0; e->first_bit = 1;
    e->out.buf = buf; e->out.cap = cap; e->out.nbits = 0; e->out.error = 0;
    ctx_init(e->state, e->mps, init_type, slice_qp);
}

static void enc_put_bit(CabacEnc *e, int bit) {
    if (e->first_bit) e->first_bit = 0; else put_bit_raw(&e->out, bit);
    while (e->bits_outstanding > 0) { put_bit_raw(&e->out, 1 - bit); e->bits_outstanding--; }
}

static void enc_renorm(CabacEnc *e) {
    while (e->range < 256) {
        if (e->low >= 512) { enc_put_bit(e, 1); e->low -= 512; }
        else if (e->low < 256) enc_put_bit(e, 0);
        else { e->low -= 256; e->bits_outstanding++; }
        e->range <<= 1; e->low <<= 1;
    }
}

static void enc_bin(CabacEnc *e, int ctx, int bin) {
    int st = e->state[ctx], mps = e->mps[ctx];
    uint32_t lps = RANGE_TAB_LPS[st][(e->range >> 6) & 3];
    e->range -= lps;
    if (bin != mps) {
        e->low += e->range;
        e->range = lps;
        if (st == 0) e->mps[ctx] = (uint8_t)(1 - mps);
        e->state[ctx] = TRANS_IDX_LPS[st];
    } else {
        e->state[ctx] = TRANS_IDX_MPS[st];
    }
    enc_renorm(e);
}

static void enc_bypass(CabacEnc *e, int bin) {
    e->low <<= 1;
    if (bin) e->low += e->range;
    if (e->low >= 1024) { enc_put_bit(e, 1); e->low -= 1024; }
    else if (e->low < 512) enc_put_bit(e, 0);
    else { e->low -= 512; e->bits_outstanding++; }
}

static void enc_bypass_bits(CabacEnc *e, uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) enc_bypass(e, (v >> i) & 1);
}

static void enc_flush(CabacEnc *e) {
    e->range = 2;
    enc_renorm(e);
    enc_put_bit(e, (e->low >> 9) & 1);
    put_bit_raw(&e->out, (e->low >> 8) & 1);
    put_bit_raw(&e->out, 1);
}

static void enc_terminate(CabacEnc *e, int bin) {
    e->range -= 2;
    if (bin) { e->low += e->range; enc_flush(e); }
    else enc_renorm(e);
}

/* ------------------------------------------------------------ decoder */

typedef struct {
    uint32_t range, offset;
    const uint8_t *buf;
    long nbits, bitpos;
    uint8_t state[NUM_CONTEXTS];
    uint8_t mps[NUM_CONTEXTS];
} CabacDec;

static int dec_read_bit(CabacDec *d) {
    if (d->bitpos >= d->nbits) return 0;
    int b = (d->buf[d->bitpos >> 3] >> (7 - (d->bitpos & 7))) & 1;
    d->bitpos++;
    return b;
}

static void dec_init(CabacDec *d, const uint8_t *buf, long len, int init_type, int slice_qp) {
    d->buf = buf; d->nbits = len * 8; d->bitpos = 0;
    d->range = 510; d->offset = 0;
    for (int i = 0; i < 9; i++) d->offset = (d->offset << 1) | dec_read_bit(d);
    ctx_init(d->state, d->mps, init_type, slice_qp);
}

static int dec_bin(CabacDec *d, int ctx) {
    int st = d->state[ctx], mps = d->mps[ctx];
    uint32_t lps = RANGE_TAB_LPS[st][(d->range >> 6) & 3];
    int bin;
    d->range -= lps;
    if (d->offset >= d->range) {
        bin = 1 - mps;
        d->offset -= d->range;
        d->range = lps;
        if (st == 0) d->mps[ctx] = (uint8_t)(1 - mps);
        d->state[ctx] = TRANS_IDX_LPS[st];
    } else {
        bin = mps;
        d->state[ctx] = TRANS_IDX_MPS[st];
    }
    while (d->range < 256) { d->range <<= 1; d->offset = (d->offset << 1) | dec_read_bit(d); }
    return bin;
}

static int dec_bypass(CabacDec *d) {
    d->offset = (d->offset << 1) | dec_read_bit(d);
    if (d->offset >= d->range) { d->offset -= d->range; return 1; }
    return 0;
}

static uint32_t dec_bypass_bits(CabacDec *d, int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | dec_bypass(d);
    return v;
}

static int dec_terminate(CabacDec *d) {
    d->range -= 2;
    if (d->offset >= d->range) return 1;
    while (d->range < 256) { d->range <<= 1; d->offset = (d->offset << 1) | dec_read_bit(d); }
    return 0;
}

/* ------------------------------------------------------- coeff remaining */

static void enc_remaining(CabacEnc *e, uint32_t value, int rice) {
    uint32_t q = value >> rice;
    if (q < 4) {
        enc_bypass_bits(e, (1u << (q + 1)) - 2, q + 1);
        if (rice) enc_bypass_bits(e, value & ((1u << rice) - 1), rice);
    } else {
        uint32_t v = value - (4u << rice);
        int c = 0;
        while (v >= (1u << (rice + 1 + c))) { v -= 1u << (rice + 1 + c); c++; }
        int ones = 4 + c;
        enc_bypass_bits(e, ((1u << ones) - 1) << 1, ones + 1);
        enc_bypass_bits(e, v, rice + 1 + c);
    }
}

static uint32_t dec_remaining(CabacDec *d, int rice) {
    int prefix = 0;
    while (prefix < 32 && dec_bypass(d)) prefix++;
    if (prefix < 4) return ((uint32_t)prefix << rice) + (rice ? dec_bypass_bits(d, rice) : 0);
    int c = prefix - 4;
    uint32_t base = (4u << rice) + (((1u << c) - 1) << (rice + 1));
    return base + dec_bypass_bits(d, rice + 1 + c);
}

/* ------------------------------------------------------------ scans */

/* diag scan of size s (up-right): fills pos[i] = y*s + x */
static void diag_scan(int s, int *pos) {
    int i = 0, x = 0, y = 0;
    while (i < s * s) {
        while (y >= 0) {
            if (x < s && y < s) pos[i++] = y * s + x;
            y--; x++;
        }
        y = x; x = 0;
    }
}

static void horiz_scan(int s, int *pos) {
    int i = 0;
    for (int y = 0; y < s; y++) for (int x = 0; x < s; x++) pos[i++] = y * s + x;
}

static void vert_scan(int s, int *pos) {
    int i = 0;
    for (int x = 0; x < s; x++) for (int y = 0; y < s; y++) pos[i++] = y * s + x;
}

static void get_scan(int scan_idx, int s, int *pos) {
    if (scan_idx == 1) horiz_scan(s, pos);
    else if (scan_idx == 2) vert_scan(s, pos);
    else diag_scan(s, pos);
}

static const int CTX_IDX_MAP_4X4[16] = {0,1,4,5,2,3,4,5,6,6,8,8,7,7,8,8};

static int last_prefix_ctx(int log2, int c_idx, int bin_idx) {
    int offset, shift;
    if (c_idx == 0) { offset = 3 * (log2 - 2) + ((log2 - 1) >> 2); shift = (log2 + 1) >> 2; }
    else { offset = 15; shift = log2 - 2; }
    return (bin_idx >> shift) + offset;
}

static int sig_ctx(int log2, int c_idx, int scan_idx, int xc, int yc, const uint8_t *csbf, int nsb) {
    int sig;
    if (log2 == 2) sig = CTX_IDX_MAP_4X4[(yc << 2) + xc];
    else if (xc + yc == 0) sig = 0;
    else {
        int xs = xc >> 2, ys = yc >> 2;
        int prev = 0;
        if (xs < nsb - 1) prev += csbf[ys * nsb + xs + 1];
        if (ys < nsb - 1) prev += 2 * csbf[(ys + 1) * nsb + xs];
        int xp = xc & 3, yp = yc & 3;
        if (prev == 0) sig = (xp + yp == 0) ? 2 : (xp + yp < 3 ? 1 : 0);
        else if (prev == 1) sig = (yp == 0) ? 2 : (yp == 1 ? 1 : 0);
        else if (prev == 2) sig = (xp == 0) ? 2 : (xp == 1 ? 1 : 0);
        else sig = 2;
        if (c_idx == 0) {
            if (xs + ys > 0) sig += 3;
            sig += (log2 == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
        } else {
            sig += (log2 == 3) ? 9 : 12;
        }
    }
    return CTX_SIG_COEFF_FLAG + sig + (c_idx ? 27 : 0);
}

static int last_prefix_of(int v) {
    if (v < 4) return v;
    int p = 4;
    for (;;) {
        int nbits = (p >> 1) - 1;
        int base = (2 + (p & 1)) << nbits;
        if (v < base + (1 << nbits)) return p;
        p++;
    }
}

/* -------------------------------------------------- residual encode */

static int encode_residual(CabacEnc *e, const int32_t *coeffs, int log2, int c_idx, int scan_idx) {
    int n = 1 << log2;
    int pos4[16];
    int sbpos[64];
    int nsb_dim = n >> 2; if (nsb_dim < 1) nsb_dim = 1;
    int nsb = nsb_dim * nsb_dim;
    get_scan(scan_idx, 4, pos4);
    get_scan(scan_idx, nsb_dim, sbpos);

    /* last significant position in scan order */
    int last_pos = -1;
    for (int i = 0; i < nsb; i++) {
        int sb = sbpos[i];
        int sx = sb % nsb_dim, sy = sb / nsb_dim;
        for (int k = 0; k < 16; k++) {
            int px = pos4[k] % 4, py = pos4[k] / 4;
            if (coeffs[((sy << 2) + py) * n + (sx << 2) + px]) last_pos = i * 16 + k;
        }
    }
    if (last_pos < 0) return -1;
    int last_sb = last_pos >> 4, last_scan = last_pos & 15;
    int lsb = sbpos[last_sb];
    int lsx = lsb % nsb_dim, lsy = lsb / nsb_dim;
    int lpx = pos4[last_scan] % 4, lpy = pos4[last_scan] / 4;
    int last_x = (lsx << 2) + lpx, last_y = (lsy << 2) + lpy;
    if (scan_idx == 2) { int t = last_x; last_x = last_y; last_y = t; }

    /* last_sig_coeff_x/y prefix+suffix */
    int cmax = (log2 << 1) - 1;
    int pref_x = last_prefix_of(last_x), pref_y = last_prefix_of(last_y);
    for (int b = 0; b < pref_x; b++) enc_bin(e, CTX_LAST_SIG_COEFF_X_PREFIX + last_prefix_ctx(log2, c_idx, b), 1);
    if (pref_x < cmax) enc_bin(e, CTX_LAST_SIG_COEFF_X_PREFIX + last_prefix_ctx(log2, c_idx, pref_x), 0);
    for (int b = 0; b < pref_y; b++) enc_bin(e, CTX_LAST_SIG_COEFF_Y_PREFIX + last_prefix_ctx(log2, c_idx, b), 1);
    if (pref_y < cmax) enc_bin(e, CTX_LAST_SIG_COEFF_Y_PREFIX + last_prefix_ctx(log2, c_idx, pref_y), 0);
    if (pref_x > 3) { int nb = (pref_x >> 1) - 1; enc_bypass_bits(e, last_x - ((2 + (pref_x & 1)) << nb), nb); }
    if (pref_y > 3) { int nb = (pref_y >> 1) - 1; enc_bypass_bits(e, last_y - ((2 + (pref_y & 1)) << nb), nb); }

    uint8_t csbf[64];
    memset(csbf, 0, sizeof csbf);
    for (int i = 0; i < nsb; i++) {
        int sb = sbpos[i];
        int sx = sb % nsb_dim, sy = sb / nsb_dim;
        int any = 0;
        for (int py = 0; py < 4; py++)
            for (int px = 0; px < 4; px++)
                if (coeffs[((sy << 2) + py) * n + (sx << 2) + px]) any = 1;
        csbf[sy * nsb_dim + sx] = (uint8_t)any;
    }
    csbf[lsy * nsb_dim + lsx] = 1;

    int prev_c1 = 1;
    for (int i = last_sb; i >= 0; i--) {
        int sb = sbpos[i];
        int sx = sb % nsb_dim, sy = sb / nsb_dim;
        int infer_dc = 0;
        int coded = csbf[sy * nsb_dim + sx];
        if (i > 0 && i < last_sb) {
            int ctx = 0;
            if (sx < nsb_dim - 1) ctx += csbf[sy * nsb_dim + sx + 1];
            if (sy < nsb_dim - 1) ctx += csbf[(sy + 1) * nsb_dim + sx];
            enc_bin(e, CTX_CODED_SUB_BLOCK_FLAG + (ctx > 1 ? 1 : ctx) + (c_idx ? 2 : 0), coded);
            infer_dc = 1;
        } else {
            coded = 1;
            csbf[sy * nsb_dim + sx] = 1;
        }
        if (!coded) continue;

        int sig[16];
        int32_t levels[16];
        for (int k = 0; k < 16; k++) {
            int px = pos4[k] % 4, py = pos4[k] / 4;
            levels[k] = coeffs[((sy << 2) + py) * n + (sx << 2) + px];
            sig[k] = levels[k] != 0;
        }
        int start = (i == last_sb) ? last_scan - 1 : 15;
        if (i == last_sb) sig[last_scan] = 1;
        for (int k = start; k >= 0; k--) {
            if (k > 0 || !infer_dc) {
                int px = pos4[k] % 4, py = pos4[k] / 4;
                enc_bin(e, sig_ctx(log2, c_idx, scan_idx, (sx << 2) + px, (sy << 2) + py, csbf, nsb_dim), sig[k]);
                if (sig[k]) infer_dc = 0;
            }
            /* else: DC significance inferred to 1 by the decoder */
        }

        /* levels */
        int sig_pos[16], nsig = 0;
        int kmax = (i == last_sb) ? last_scan : 15;
        for (int k = kmax; k >= 0; k--) if (sig[k]) sig_pos[nsig++] = k;
        if (!nsig) continue;
        int ctx_set = ((i > 0 && c_idx == 0) ? 2 : 0) + (prev_c1 == 0 ? 1 : 0);
        int c1 = 1;
        int g1_base = CTX_COEFF_ABS_LEVEL_GREATER1_FLAG + (c_idx ? 16 : 0);
        int g2_base = CTX_COEFF_ABS_LEVEL_GREATER2_FLAG + (c_idx ? 4 : 0);
        int num_g1 = nsig < 8 ? nsig : 8;
        int g1_flag[16], has_g1[16], g2_val = 0, first_g1 = -1;
        memset(has_g1, 0, sizeof has_g1);
        for (int idx = 0; idx < num_g1; idx++) {
            int k = sig_pos[idx];
            int32_t a = levels[k] < 0 ? -levels[k] : levels[k];
            int flag = a > 1;
            enc_bin(e, g1_base + ctx_set * 4 + c1, flag);
            g1_flag[k] = flag; has_g1[k] = 1;
            if (flag) { if (first_g1 < 0) first_g1 = k; c1 = 0; }
            else if (c1 > 0 && c1 < 3) c1++;
        }
        int has_g2 = 0;
        if (first_g1 >= 0) {
            int32_t a = levels[first_g1] < 0 ? -levels[first_g1] : levels[first_g1];
            g2_val = a > 2;
            enc_bin(e, g2_base + ctx_set, g2_val);
            has_g2 = 1;
        }
        for (int idx = 0; idx < nsig; idx++) enc_bypass(e, levels[sig_pos[idx]] < 0);
        int rice = 0;
        for (int idx = 0; idx < nsig; idx++) {
            int k = sig_pos[idx];
            int32_t a = levels[k] < 0 ? -levels[k] : levels[k];
            int g1 = has_g1[k] ? g1_flag[k] : 0;
            int g2 = (has_g2 && k == first_g1) ? g2_val : 0;
            int base_level = 1 + g1 + g2;
            int saturated = (idx >= 8) || (has_g1[k] && g1 == 1 && !(has_g2 && k == first_g1)) || g2 == 1;
            if (saturated) {
                enc_remaining(e, (uint32_t)(a - base_level), rice);
                if (a > (3 << rice) && rice < 4) rice++;
            }
        }
        prev_c1 = c1;
    }
    return 0;
}

/* -------------------------------------------------- residual decode */

static int decode_residual(CabacDec *d, int32_t *coeffs, int log2, int c_idx, int scan_idx) {
    int n = 1 << log2;
    int pos4[16];
    int sbpos[64];
    int nsb_dim = n >> 2; if (nsb_dim < 1) nsb_dim = 1;
    int nsb = nsb_dim * nsb_dim;
    get_scan(scan_idx, 4, pos4);
    get_scan(scan_idx, nsb_dim, sbpos);
    memset(coeffs, 0, sizeof(int32_t) * n * n);

    int cmax = (log2 << 1) - 1;
    int pref_x = 0, pref_y = 0;
    while (pref_x < cmax && dec_bin(d, CTX_LAST_SIG_COEFF_X_PREFIX + last_prefix_ctx(log2, c_idx, pref_x))) pref_x++;
    while (pref_y < cmax && dec_bin(d, CTX_LAST_SIG_COEFF_Y_PREFIX + last_prefix_ctx(log2, c_idx, pref_y))) pref_y++;
    int last_x, last_y;
    if (pref_x > 3) { int nb = (pref_x >> 1) - 1; last_x = ((2 + (pref_x & 1)) << nb) + dec_bypass_bits(d, nb); }
    else last_x = pref_x;
    if (pref_y > 3) { int nb = (pref_y >> 1) - 1; last_y = ((2 + (pref_y & 1)) << nb) + dec_bypass_bits(d, nb); }
    else last_y = pref_y;
    if (scan_idx == 2) { int t = last_x; last_x = last_y; last_y = t; }

    int last_pos = -1;
    for (int i = 0; i < nsb && last_pos < 0; i++) {
        int sb = sbpos[i];
        int sx = sb % nsb_dim, sy = sb / nsb_dim;
        for (int k = 0; k < 16; k++) {
            int px = pos4[k] % 4, py = pos4[k] / 4;
            if ((sx << 2) + px == last_x && (sy << 2) + py == last_y) { last_pos = i * 16 + k; break; }
        }
    }
    if (last_pos < 0) return -1;
    int last_sb = last_pos >> 4, last_scan = last_pos & 15;

    uint8_t csbf[64];
    memset(csbf, 0, sizeof csbf);
    int prev_c1 = 1;
    for (int i = last_sb; i >= 0; i--) {
        int sb = sbpos[i];
        int sx = sb % nsb_dim, sy = sb / nsb_dim;
        int infer_dc = 0, coded;
        if (i > 0 && i < last_sb) {
            int ctx = 0;
            if (sx < nsb_dim - 1) ctx += csbf[sy * nsb_dim + sx + 1];
            if (sy < nsb_dim - 1) ctx += csbf[(sy + 1) * nsb_dim + sx];
            coded = dec_bin(d, CTX_CODED_SUB_BLOCK_FLAG + (ctx > 1 ? 1 : ctx) + (c_idx ? 2 : 0));
            infer_dc = 1;
        } else coded = 1;
        csbf[sy * nsb_dim + sx] = (uint8_t)coded;
        if (!coded) continue;

        int sig[16];
        memset(sig, 0, sizeof sig);
        int start = (i == last_sb) ? last_scan - 1 : 15;
        if (i == last_sb) sig[last_scan] = 1;
        for (int k = start; k >= 0; k--) {
            if (k > 0 || !infer_dc) {
                int px = pos4[k] % 4, py = pos4[k] / 4;
                sig[k] = dec_bin(d, sig_ctx(log2, c_idx, scan_idx, (sx << 2) + px, (sy << 2) + py, csbf, nsb_dim));
                if (sig[k]) infer_dc = 0;
            } else sig[0] = 1;
        }

        int sig_pos[16], nsig = 0;
        int kmax = (i == last_sb) ? last_scan : 15;
        for (int k = kmax; k >= 0; k--) if (sig[k]) sig_pos[nsig++] = k;
        if (!nsig) continue;
        int ctx_set = ((i > 0 && c_idx == 0) ? 2 : 0) + (prev_c1 == 0 ? 1 : 0);
        int c1 = 1;
        int g1_base = CTX_COEFF_ABS_LEVEL_GREATER1_FLAG + (c_idx ? 16 : 0);
        int g2_base = CTX_COEFF_ABS_LEVEL_GREATER2_FLAG + (c_idx ? 4 : 0);
        int num_g1 = nsig < 8 ? nsig : 8;
        int g1_flag[16], has_g1[16], g2_val = 0, has_g2 = 0, first_g1 = -1;
        memset(has_g1, 0, sizeof has_g1);
        for (int idx = 0; idx < num_g1; idx++) {
            int k = sig_pos[idx];
            int flag = dec_bin(d, g1_base + ctx_set * 4 + c1);
            g1_flag[k] = flag; has_g1[k] = 1;
            if (flag) { if (first_g1 < 0) first_g1 = k; c1 = 0; }
            else if (c1 > 0 && c1 < 3) c1++;
        }
        if (first_g1 >= 0) { g2_val = dec_bin(d, g2_base + ctx_set); has_g2 = 1; }
        int sign[16];
        for (int idx = 0; idx < nsig; idx++) sign[idx] = dec_bypass(d);
        int rice = 0;
        for (int idx = 0; idx < nsig; idx++) {
            int k = sig_pos[idx];
            int g1 = has_g1[k] ? g1_flag[k] : 0;
            int g2 = (has_g2 && k == first_g1) ? g2_val : 0;
            int base_level = 1 + g1 + g2;
            int saturated = (idx >= 8) || (has_g1[k] && g1 == 1 && !(has_g2 && k == first_g1)) || g2 == 1;
            int32_t a = base_level;
            if (saturated) {
                a = base_level + (int32_t)dec_remaining(d, rice);
                if (a > (3 << rice) && rice < 4) rice++;
            }
            int px = pos4[k] % 4, py = pos4[k] / 4;
            coeffs[((sy << 2) + py) * n + (sx << 2) + px] = sign[idx] ? -a : a;
        }
        prev_c1 = c1;
    }
    return 0;
}

/* -------------------------------------------------- CU-layer (intra v1) */

static void mpm_list(int a, int b, int mpm[3]) {
    if (a == b) {
        if (a < 2) { mpm[0] = 0; mpm[1] = 1; mpm[2] = 26; }
        else { mpm[0] = a; mpm[1] = 2 + ((a + 29) % 32); mpm[2] = 2 + ((a - 1) % 32); }
    } else {
        mpm[0] = a; mpm[1] = b;
        mpm[2] = (a != 0 && b != 0) ? 0 : ((a != 1 && b != 1) ? 1 : 26);
    }
}

static void enc_luma_mode(CabacEnc *e, int mode, int a, int b) {
    int mpm[3];
    mpm_list(a, b, mpm);
    int idx = -1;
    for (int i = 0; i < 3; i++) if (mpm[i] == mode) { idx = i; break; }
    if (idx >= 0) {
        enc_bin(e, CTX_PREV_INTRA_LUMA_PRED_FLAG, 1);
        enc_bypass(e, idx ? 1 : 0);
        if (idx) enc_bypass(e, idx - 1);
    } else {
        enc_bin(e, CTX_PREV_INTRA_LUMA_PRED_FLAG, 0);
        int s[3] = {mpm[0], mpm[1], mpm[2]};
        /* sort descending */
        for (int i = 0; i < 2; i++) for (int j = i + 1; j < 3; j++) if (s[j] > s[i]) { int t = s[i]; s[i] = s[j]; s[j] = t; }
        int rem = mode;
        for (int i = 0; i < 3; i++) if (mode > s[i]) rem--;
        enc_bypass_bits(e, (uint32_t)rem, 5);
    }
}

static int dec_luma_mode(CabacDec *d, int a, int b) {
    int mpm[3];
    mpm_list(a, b, mpm);
    if (dec_bin(d, CTX_PREV_INTRA_LUMA_PRED_FLAG)) {
        int idx = 0;
        if (dec_bypass(d)) idx = 1 + dec_bypass(d);
        return mpm[idx];
    }
    int rem = (int)dec_bypass_bits(d, 5);
    int s[3] = {mpm[0], mpm[1], mpm[2]};
    for (int i = 0; i < 2; i++) for (int j = i + 1; j < 3; j++) if (s[j] < s[i]) { int t = s[i]; s[i] = s[j]; s[j] = t; }
    for (int i = 0; i < 3; i++) if (rem >= s[i]) rem++;
    return rem;
}

static int any_nonzero(const int32_t *p, int count) {
    for (int i = 0; i < count; i++) if (p[i]) return 1;
    return 0;
}

long encode_slice_data_intra_c(
    const int32_t *modes, const int32_t *lev_y, const int32_t *lev_cb, const int32_t *lev_cr,
    int nctu, int ctbs_w, int ctb_log2, int at_min_cb, int slice_qp,
    uint8_t *out, long out_cap) {
    CabacEnc e;
    enc_init(&e, 0, slice_qp, out, out_cap);
    int n = 1 << ctb_log2;
    int ylen = n * n, clen = (n / 2) * (n / 2);
    for (int i = 0; i < nctu; i++) {
        int c = i % ctbs_w;
        int mode = modes[i];
        if (at_min_cb) enc_bin(&e, CTX_PART_MODE, 1);
        int cand_a = c > 0 ? modes[i - 1] : 1;
        enc_luma_mode(&e, mode, cand_a, 1);
        enc_bin(&e, CTX_INTRA_CHROMA_PRED_MODE, 0);
        const int32_t *ly = lev_y + (long)i * ylen;
        const int32_t *lcb = lev_cb + (long)i * clen;
        const int32_t *lcr = lev_cr + (long)i * clen;
        int cbf_cb = any_nonzero(lcb, clen);
        int cbf_cr = any_nonzero(lcr, clen);
        int cbf_y = any_nonzero(ly, ylen);
        enc_bin(&e, CTX_CBF_CHROMA, cbf_cb);
        enc_bin(&e, CTX_CBF_CHROMA, cbf_cr);
        enc_bin(&e, CTX_CBF_LUMA + 1, cbf_y);
        if (cbf_y && encode_residual(&e, ly, ctb_log2, 0, 0)) return -2;
        if (cbf_cb && encode_residual(&e, lcb, ctb_log2 - 1, 1, 0)) return -2;
        if (cbf_cr && encode_residual(&e, lcr, ctb_log2 - 1, 2, 0)) return -2;
        enc_terminate(&e, i == nctu - 1);
        if (e.out.error) return -1;
    }
    /* byte-align with zeros */
    while (e.out.nbits & 7) put_bit_raw(&e.out, 0);
    return e.out.nbits >> 3;
}

int decode_slice_data_intra_c(
    const uint8_t *payload, long payload_len,
    int nctu, int ctbs_w, int ctb_log2, int at_min_cb, int slice_qp,
    int32_t *modes, int32_t *lev_y, int32_t *lev_cb, int32_t *lev_cr) {
    CabacDec d;
    dec_init(&d, payload, payload_len, 0, slice_qp);
    int n = 1 << ctb_log2;
    int ylen = n * n, clen = (n / 2) * (n / 2);
    memset(lev_y, 0, sizeof(int32_t) * (long)nctu * ylen);
    memset(lev_cb, 0, sizeof(int32_t) * (long)nctu * clen);
    memset(lev_cr, 0, sizeof(int32_t) * (long)nctu * clen);
    for (int i = 0; i < nctu; i++) {
        int c = i % ctbs_w;
        if (at_min_cb) {
            if (dec_bin(&d, CTX_PART_MODE) != 1) return -10; /* NxN unsupported */
        }
        int cand_a = c > 0 ? modes[i - 1] : 1;
        modes[i] = dec_luma_mode(&d, cand_a, 1);
        if (dec_bin(&d, CTX_INTRA_CHROMA_PRED_MODE) != 0) return -11;
        int cbf_cb = dec_bin(&d, CTX_CBF_CHROMA);
        int cbf_cr = dec_bin(&d, CTX_CBF_CHROMA);
        int cbf_y = dec_bin(&d, CTX_CBF_LUMA + 1);
        if (cbf_y && decode_residual(&d, lev_y + (long)i * ylen, ctb_log2, 0, 0)) return -12;
        if (cbf_cb && decode_residual(&d, lev_cb + (long)i * clen, ctb_log2 - 1, 1, 0)) return -12;
        if (cbf_cr && decode_residual(&d, lev_cr + (long)i * clen, ctb_log2 - 1, 2, 0)) return -12;
        int end = dec_terminate(&d);
        int expected = (i == nctu - 1) ? 1 : 0;
        if (end != expected) return -13;
    }
    return 0;
}
