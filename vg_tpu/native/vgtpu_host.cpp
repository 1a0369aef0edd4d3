// vg_tpu native host kernels.
//
// The reference implements its host-side hot loops in C/C++ (gbwtgraph's
// minimizer extraction, gssw/dozeu DP, SURVEY.md §2.2); vg_tpu keeps the
// batch compute on the TPU but gives the host-side residue the same
// treatment: rolling minimizer extraction (index build + read seeding)
// and the banded semiglobal DP traceback used for indel winners.
// Built on demand with g++ (see vg_tpu/native/__init__.py); every entry
// point has a numpy fallback so the toolkit works without a toolchain.
#include <array>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <algorithm>

static inline int64_t now_ns() {
    return std::chrono::duration_cast<std::chrono::nanoseconds>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}
#include <cmath>

// TSan cannot see libgomp's end-of-parallel-region barrier (libgomp is
// not instrumented), so the OpenMP batch entry points annotate the
// worker->main handoff explicitly; no-ops outside -fsanitize=thread.
#if defined(__SANITIZE_THREAD__)
extern "C" void __tsan_acquire(void*);
extern "C" void __tsan_release(void*);
#define VGTPU_HB_RELEASE(p) __tsan_release((void*)(p))
#define VGTPU_HB_ACQUIRE(p) __tsan_acquire((void*)(p))
#else
#define VGTPU_HB_RELEASE(p) ((void)0)
#define VGTPU_HB_ACQUIRE(p) ((void)0)
#endif

namespace {

inline uint64_t wang_hash(uint64_t x) {
    x = (~x) + (x << 21);
    x = x ^ (x >> 24);
    x = (x + (x << 3)) + (x << 8);
    x = x ^ (x >> 14);
    x = (x + (x << 2)) + (x << 4);
    x = x ^ (x >> 28);
    x = x + (x << 31);
    return x;
}

}  // namespace

extern "C" {

// (k,w) canonical minimizers; all window minima kept (ties included),
// matching vg_tpu.index.minimizer.extract_minimizers. Returns count.
int64_t extract_minimizers(const uint8_t* codes, int64_t n, int32_t k,
                           int32_t w, int64_t* out_offs, uint64_t* out_keys,
                           uint8_t* out_rev) {
    if (n < k) return 0;
    const int64_t m = n - k + 1;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    std::vector<uint64_t> hashes(m), keys(m);
    std::vector<uint8_t> canon_rev(m), valid(m);

    uint64_t fwd = 0, rev = 0;
    int64_t invalid_run = 0;
    const int shift_top = 2 * (k - 1);
    for (int64_t j = 0; j < n; j++) {
        const uint8_t c = codes[j];
        const uint8_t cc = (c < 4) ? c : 0;
        if (c >= 4) invalid_run = k;
        else if (invalid_run > 0) invalid_run--;
        fwd = ((fwd << 2) | cc) & mask;
        rev = (rev >> 2) | ((uint64_t)(3 - cc) << shift_top);
        if (j >= k - 1) {
            const int64_t i = j - k + 1;
            const bool cr = rev < fwd;
            const uint64_t key = cr ? rev : fwd;
            keys[i] = key;
            canon_rev[i] = cr;
            const bool ok = invalid_run == 0;
            valid[i] = ok;
            hashes[i] = ok ? wang_hash(key) : ~0ULL;
        }
    }
    const int64_t w_eff = std::min<int64_t>(w, m);
    std::vector<uint8_t> chosen(m, 0);
    std::vector<int64_t> dq(m);
    int64_t head = 0, tail = 0;
    for (int64_t i = 0; i < m; i++) {
        while (tail > head && hashes[dq[tail - 1]] > hashes[i]) tail--;
        dq[tail++] = i;
        const int64_t wstart = i - w_eff + 1;
        if (wstart >= 0) {
            while (dq[head] < wstart) head++;
            const uint64_t mn = hashes[dq[head]];
            for (int64_t t = head; t < tail; t++) {
                if (hashes[dq[t]] == mn) chosen[dq[t]] = 1;
                else break;
            }
        }
    }
    int64_t cnt = 0;
    for (int64_t i = 0; i < m; i++) {
        if (chosen[i] && valid[i]) {
            out_offs[cnt] = i;
            out_keys[cnt] = keys[i];
            out_rev[cnt] = canon_rev[i];
            cnt++;
        }
    }
    return cnt;
}

// Banded semiglobal DP + traceback, same objective as
// vg_tpu.ops.align.banded_scores / ops.traceback.banded_traceback.
// edits: triples (op, len=1, read_pos) with op 0=M 1=X 2=I 3=D.
// Returns best score; 0 = no alignment. *n_edits = -1 on overflow.
int64_t banded_traceback(const uint8_t* read, int64_t L,
                         const uint8_t* window, int64_t TW, int32_t B,
                         int32_t match, int32_t mismatch, int32_t gap_open,
                         int32_t gap_extend, int32_t bonus,
                         int64_t* spans, int32_t* edits, int64_t edit_cap,
                         int64_t* n_edits, int64_t* matches_out,
                         int32_t x_drop) {
    const int64_t W = 2 * (int64_t)B + 1;
    const int64_t NEG = -(1LL << 40);
    std::vector<int64_t> H((L + 1) * W, NEG), F((L + 1) * W, NEG),
        E((L + 1) * W, NEG);
    std::vector<int8_t> op((L + 1) * W, 0), fop((L + 1) * W, 0),
        eop((L + 1) * W, 0);
    for (int64_t kk = 0; kk < W; kk++) { H[kk] = bonus; op[kk] = 3; }

    int64_t best = 0, bi = -1, bk = -1;
    for (int64_t i = 1; i <= L; i++) {
        const uint8_t rb = read[i - 1];
        int64_t* Hi = &H[i * W];
        const int64_t* Hp = &H[(i - 1) * W];
        int64_t* Fi = &F[i * W];
        const int64_t* Fp = &F[(i - 1) * W];
        int64_t* Ei = &E[i * W];
        int8_t* opi = &op[i * W];
        int8_t* fopi = &fop[i * W];
        int8_t* eopi = &eop[i * W];
        int64_t rowmax = NEG, rowarg = 0;
        int64_t eprev = NEG, hn_prev = NEG;
        for (int64_t kk = 0; kk < W; kk++) {
            const int64_t j = i - 1 + kk;
            const uint8_t wb = (j < TW) ? window[j] : 6;
            const int64_t sub = (wb == rb && rb < 4) ? match : -mismatch;
            const int64_t diag = Hp[kk] + sub;
            const int64_t sh = (kk + 1 < W) ? Hp[kk + 1] : NEG;
            const int64_t sf = (kk + 1 < W) ? Fp[kk + 1] : NEG;
            const int64_t fval = std::max(sh - gap_open, sf - gap_extend);
            Fi[kk] = fval;
            fopi[kk] = (sf - gap_extend > sh - gap_open) ? 1 : 0;
            int64_t hn = std::max(diag, fval);
            int8_t o = (fval > diag) ? 1 : 0;
            if (hn < 0) { hn = 0; o = 3; }
            int64_t eval;
            if (kk == 0) {
                eval = NEG;
                eopi[kk] = 0;
            } else {
                eval = std::max(hn_prev - gap_open, eprev - gap_extend);
                eopi[kk] = (hn_prev - gap_open >= eprev - gap_extend) ? 0 : 1;
            }
            Ei[kk] = eval;
            int64_t hfin = hn;
            if (eval > hfin) { hfin = eval; o = 2; }
            Hi[kk] = hfin;
            opi[kk] = o;
            eprev = eval;
            hn_prev = hn;
            if (hfin > rowmax) { rowmax = hfin; rowarg = kk; }
        }
        if (rowmax > best) { best = rowmax; bi = i; bk = rowarg; }
        if (i == L && rowmax + bonus > best) {
            best = rowmax + bonus; bi = i; bk = rowarg;
        }
        // X-drop early exit (dozeu role, reference
        // src/dozeu_interface.cpp:210-300): once the whole band has
        // fallen x_drop below the running best, stop filling — the
        // traceback from (bi, bk) only needs rows already filled.
        if (x_drop > 0 && best > 0 && rowmax < best - x_drop) break;
    }
    if (bi < 0 || best <= 0) { *n_edits = 0; *matches_out = 0; return 0; }

    int64_t i = bi, kk = bk;
    int64_t cnt = 0, nmatch = 0;
    int state = 0;
    bool overflow = false;
    auto push = [&](int32_t opc, int64_t rp) -> bool {
        if (cnt >= edit_cap) return false;
        edits[cnt * 3] = opc;
        edits[cnt * 3 + 1] = 1;
        edits[cnt * 3 + 2] = (int32_t)rp;
        cnt++;
        return true;
    };
    while (true) {
        if (state == 0) {
            const int8_t o = op[i * W + kk];
            if (o == 3) break;
            if (o == 0) {
                const int64_t j = i + kk - 1;
                const uint8_t wb = (j >= 0 && j < TW) ? window[j] : 6;
                if (wb == read[i - 1] && read[i - 1] < 4) {
                    if (!push(0, i - 1)) { overflow = true; break; }
                    nmatch++;
                } else if (!push(1, i - 1)) { overflow = true; break; }
                i--;
            } else if (o == 1) state = 1;
            else state = 2;
        } else if (state == 1) {
            if (!push(2, i - 1)) { overflow = true; break; }
            const int8_t ext = fop[i * W + kk];
            i--; kk++;
            state = ext ? 1 : 0;
        } else {
            if (!push(3, -1)) { overflow = true; break; }
            const int8_t ext = eop[i * W + kk];
            kk--;
            state = ext ? 2 : 0;
        }
        if (i == 0 && state == 0 && op[kk] == 3) break;
    }
    if (overflow) { *n_edits = -1; *matches_out = nmatch; return best; }
    spans[0] = i;
    spans[1] = bi;
    spans[2] = i + kk;
    spans[3] = bi + bk;
    *n_edits = cnt;
    *matches_out = nmatch;
    return best;
}

}  // extern "C"

extern "C" {

// Global (both-ends-pinned) affine alignment for chain links; same
// objective as vg_tpu.ops.global_align.global_align. Edits as unit
// triples (op, 1, read_pos) in traceback order, op 0=M 1=X 2=I 3=D.
// Returns score; *n_edits = -1 if (la+1)*(lb+1) > max_cells (caller
// falls back) or on edit overflow.
// full-matrix affine global alignment (small problems / banded fallback)
static int64_t global_align_full(
    const uint8_t* a, int64_t la, const uint8_t* b,
    int64_t lb, int32_t match, int32_t mismatch,
    int32_t gap_open, int32_t gap_extend,
    int64_t max_cells, int32_t* edits, int64_t edit_cap,
    int64_t* n_edits) {
    const int64_t NEG = -(1LL << 40);
    *n_edits = 0;
    if (la == 0 && lb == 0) return 0;
    if ((la + 1) * (lb + 1) > max_cells) { *n_edits = -1; return 0; }
    const int64_t Wb = lb + 1;
    std::vector<int64_t> H((la + 1) * Wb, NEG), E((la + 1) * Wb, NEG),
        F((la + 1) * Wb, NEG);
    H[0] = 0;
    for (int64_t j = 1; j <= lb; j++) {
        E[j] = -(gap_open + (j - 1) * gap_extend);
        H[j] = E[j];
    }
    for (int64_t i = 1; i <= la; i++) {
        int64_t* Hi = &H[i * Wb];
        const int64_t* Hp = &H[(i - 1) * Wb];
        int64_t* Ei = &E[i * Wb];
        int64_t* Fi = &F[i * Wb];
        const int64_t* Fp = &F[(i - 1) * Wb];
        Fi[0] = -(gap_open + (i - 1) * gap_extend);
        Hi[0] = Fi[0];
        const uint8_t ab = a[i - 1];
        for (int64_t j = 1; j <= lb; j++) {
            const int64_t sub = (b[j - 1] == ab && ab < 4) ? match : -mismatch;
            const int64_t diag = Hp[j - 1] + sub;
            const int64_t fval = std::max(Hp[j] - gap_open,
                                          Fp[j] - gap_extend);
            Fi[j] = fval;
            const int64_t hn = std::max(diag, fval);
            const int64_t eval = std::max(Hi[j - 1] - gap_open,
                                          Ei[j - 1] - gap_extend);
            Ei[j] = eval;
            Hi[j] = std::max(hn, eval);
        }
    }
    const int64_t score = H[la * Wb + lb];
    // traceback
    int64_t i = la, j = lb, cnt = 0;
    int state = 0;
    auto push = [&](int32_t opc, int64_t rp) -> bool {
        if (cnt >= edit_cap) return false;
        edits[cnt * 3] = opc;
        edits[cnt * 3 + 1] = 1;
        edits[cnt * 3 + 2] = (int32_t)rp;
        cnt++;
        return true;
    };
    while (i > 0 || j > 0) {
        if (state == 0) {
            if (i > 0 && j > 0) {
                const int64_t sub = (b[j - 1] == a[i - 1] && a[i - 1] < 4)
                                        ? match : -mismatch;
                if (H[i * Wb + j] == H[(i - 1) * Wb + j - 1] + sub) {
                    if (!push(sub == match ? 0 : 1, i - 1)) {
                        *n_edits = -1;
                        return score;
                    }
                    i--; j--;
                    continue;
                }
            }
            if (j > 0 && H[i * Wb + j] == E[i * Wb + j]) state = 2;
            else state = 1;
        } else if (state == 2) {
            if (!push(3, -1)) { *n_edits = -1; return score; }
            const bool ext = j > 1 &&
                E[i * Wb + j] == E[i * Wb + j - 1] - gap_extend &&
                E[i * Wb + j] != H[i * Wb + j - 1] - gap_open;
            j--;
            state = ext ? 2 : 0;
        } else {
            if (!push(2, i - 1)) { *n_edits = -1; return score; }
            const bool ext = i > 1 &&
                F[i * Wb + j] == F[(i - 1) * Wb + j] - gap_extend &&
                F[i * Wb + j] != H[(i - 1) * Wb + j] - gap_open;
            i--;
            state = ext ? 1 : 0;
        }
    }
    *n_edits = cnt;
    return score;
}

// banded affine global alignment in diagonal space: j - i confined to
// [min(0,d)-B, max(0,d)+B] (d = lb-la). Storage/time O(n * band) — the
// long-read link stage spent 6.4 ms/read filling full O(n*m) matrices
// for ~18 links/read of ~240x240 (round-4 profile).
static int64_t global_align_banded(
    const uint8_t* a, int64_t la, const uint8_t* b, int64_t lb,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_extend,
    int64_t B, int32_t* edits, int64_t edit_cap, int64_t* n_edits) {
    const int64_t NEG = -(1LL << 40);
    *n_edits = 0;
    const int64_t d = lb - la;
    const int64_t c_lo = std::min<int64_t>(0, d);
    const int64_t c_hi = std::max<int64_t>(0, d);
    const int64_t base = c_lo - B;          // smallest j-i in band
    const int64_t Wb = (c_hi - c_lo) + 2 * B + 1;
    std::vector<int64_t> H((la + 1) * Wb, NEG), E((la + 1) * Wb, NEG),
        F((la + 1) * Wb, NEG);
    auto col = [&](int64_t i, int64_t j) { return j - i - base; };
    auto inb = [&](int64_t i, int64_t j) {
        const int64_t c = col(i, j);
        return j >= 0 && j <= lb && c >= 0 && c < Wb;
    };
    auto gH = [&](int64_t i, int64_t j) {
        return inb(i, j) ? H[i * Wb + col(i, j)] : NEG;
    };
    auto gE = [&](int64_t i, int64_t j) {
        return inb(i, j) ? E[i * Wb + col(i, j)] : NEG;
    };
    auto gF = [&](int64_t i, int64_t j) {
        return inb(i, j) ? F[i * Wb + col(i, j)] : NEG;
    };
    H[col(0, 0)] = 0;
    for (int64_t j = 1; j <= lb && inb(0, j); j++) {
        E[col(0, j)] = -(gap_open + (j - 1) * gap_extend);
        H[col(0, j)] = E[col(0, j)];
    }
    for (int64_t i = 1; i <= la; i++) {
        int64_t jlo = std::max<int64_t>(0, i + base);
        const int64_t jhi = std::min<int64_t>(lb, i + base + Wb - 1);
        if (jlo == 0) {
            F[i * Wb + col(i, 0)] = -(gap_open + (i - 1) * gap_extend);
            H[i * Wb + col(i, 0)] = F[i * Wb + col(i, 0)];
            jlo = 1;
        }
        const uint8_t ab = a[i - 1];
        for (int64_t j = jlo; j <= jhi; j++) {
            const int64_t c = col(i, j);
            const int64_t sub =
                (b[j - 1] == ab && ab < 4) ? match : -mismatch;
            const int64_t diag = gH(i - 1, j - 1) + sub;
            const int64_t fval = std::max(gH(i - 1, j) - gap_open,
                                          gF(i - 1, j) - gap_extend);
            F[i * Wb + c] = fval;
            const int64_t hn = std::max(diag, fval);
            const int64_t eval = std::max(gH(i, j - 1) - gap_open,
                                          gE(i, j - 1) - gap_extend);
            E[i * Wb + c] = eval;
            H[i * Wb + c] = std::max(hn, eval);
        }
    }
    const int64_t score = gH(la, lb);
    // traceback (same state machine/tie-breaks as the full variant)
    int64_t i = la, j = lb, cnt = 0;
    int state = 0;
    auto push = [&](int32_t opc, int64_t rp) -> bool {
        if (cnt >= edit_cap) return false;
        edits[cnt * 3] = opc;
        edits[cnt * 3 + 1] = 1;
        edits[cnt * 3 + 2] = (int32_t)rp;
        cnt++;
        return true;
    };
    while (i > 0 || j > 0) {
        if (state == 0) {
            if (i > 0 && j > 0) {
                const int64_t sub = (b[j - 1] == a[i - 1] && a[i - 1] < 4)
                                        ? match : -mismatch;
                if (gH(i, j) == gH(i - 1, j - 1) + sub) {
                    if (!push(sub == match ? 0 : 1, i - 1)) {
                        *n_edits = -1;
                        return score;
                    }
                    i--; j--;
                    continue;
                }
            }
            if (j > 0 && gH(i, j) == gE(i, j)) state = 2;
            else state = 1;
        } else if (state == 2) {
            if (!push(3, -1)) { *n_edits = -1; return score; }
            const bool ext = j > 1 &&
                gE(i, j) == gE(i, j - 1) - gap_extend &&
                gE(i, j) != gH(i, j - 1) - gap_open;
            j--;
            state = ext ? 2 : 0;
        } else {
            if (!push(2, i - 1)) { *n_edits = -1; return score; }
            const bool ext = i > 1 &&
                gF(i, j) == gF(i - 1, j) - gap_extend &&
                gF(i, j) != gH(i - 1, j) - gap_open;
            i--;
            state = ext ? 1 : 0;
        }
    }
    *n_edits = cnt;
    return score;
}

// driver: band doubling with an EXACT stopping rule. Any alignment
// whose offset j-i leaves [min(0,d)-B, max(0,d)+B] must contain at
// least one insertion gap AND one deletion gap with total gap length
// >= |d| + 2(B+1), so its score is at most
//   match*min(la,lb) - 2*gap_open - gap_extend*(|d| + 2B).
// Once the banded score meets that bound (or the band covers the
// matrix: B >= min(la, lb)), the banded result equals the full DP.
// Both the fused native stitcher and the python stitcher's link batch
// call through here, so the two long-read engines stay
// decode-identical. (A plain "score stable across one doubling" stop
// was measurably wrong ~4% of the time on double-sided indels.)
int64_t global_align(const uint8_t* a, int64_t la, const uint8_t* b,
                     int64_t lb, int32_t match, int32_t mismatch,
                     int32_t gap_open, int32_t gap_extend,
                     int64_t max_cells, int32_t* edits, int64_t edit_cap,
                     int64_t* n_edits) {
    if ((la + 1) * (lb + 1) > max_cells) { *n_edits = -1; return 0; }
    if (la == 0 || lb == 0 || (la + 1) * (lb + 1) <= 64 * 64)
        return global_align_full(a, la, b, lb, match, mismatch, gap_open,
                                 gap_extend, max_cells, edits, edit_cap,
                                 n_edits);
    const int64_t ad = std::llabs(lb - la);
    int64_t B = 16;
    for (;;) {
        const bool full_cover = B >= std::min(la, lb);
        const int64_t sc = global_align_banded(
            a, la, b, lb, match, mismatch, gap_open, gap_extend, B,
            edits, edit_cap, n_edits);
        const int64_t escape_ub = (int64_t)match * std::min(la, lb)
            - 2 * (int64_t)gap_open - (int64_t)gap_extend * (ad + 2 * B);
        if (full_cover || (sc >= escape_ub && *n_edits >= 0))
            return sc;
        B *= 2;
    }
}

}  // extern "C"

namespace {

// protobuf wire helpers
inline int64_t put_varint(uint8_t* out, int64_t pos, uint64_t v) {
    while (v >= 0x80) {
        out[pos++] = (uint8_t)(v | 0x80);
        v >>= 7;
    }
    out[pos++] = (uint8_t)v;
    return pos;
}
inline int64_t put_tag(uint8_t* out, int64_t pos, uint32_t field,
                       uint32_t wt) {
    return put_varint(out, pos, (field << 3) | wt);
}
inline int varint_size(uint64_t v) {
    int n = 1;
    while (v >= 0x80) { v >>= 7; n++; }
    return n;
}

const char* BASES = "ACGTN";

}  // namespace

extern "C" {

// Encode gapless-winner GAM Alignment messages straight from arrays.
// For each winner i: text interval [t0,t1), oriented mismatch mask row,
// original read string, name, mapq/score, optional refpos.
// Output: concatenated protobuf messages; rec_off[i] = start, rec_off[N] = end.
// Returns 0 ok, -1 out buffer too small.
int64_t emit_gapless_gam(
    int64_t N,
    const int64_t* t0s, const int64_t* t1s, const uint8_t* revs,
    const int32_t* mapqs, const int32_t* scores,
    const int64_t* name_off, const uint8_t* names,
    const int64_t* read_off, const uint8_t* reads,   // ASCII, original strand
    const int64_t* qual_off, const uint8_t* quals,   // phred bytes ('' = none)
    const uint8_t* mism, int64_t RL,                 // (N, RL) oriented masks
    const int64_t* rlens,
    const int64_t* step_text_pos, const int64_t* steps, int64_t n_steps,
    const int64_t* node_id, const int64_t* seq_start,
    const int32_t* ref_path, const int64_t* ref_off, const uint8_t* ref_rev,
    const int64_t* refname_off, const uint8_t* refnames,
    uint8_t* out, int64_t out_cap, int64_t* rec_off) {
    int64_t pos = 0;
    std::vector<uint8_t> mapbuf, pathbuf, tmp;
    for (int64_t i = 0; i < N; i++) {
        rec_off[i] = pos;
        const int64_t L = rlens[i];
        const int64_t t0 = t0s[i], t1 = t1s[i];
        const bool rev = revs[i];
        const uint8_t* mrow = mism + i * RL;
        // locate step range via binary search over step_text_pos
        int64_t lo = 0, hi = n_steps;
        while (lo < hi) {          // first step with end > t0
            int64_t mid = (lo + hi) / 2;
            if (step_text_pos[mid + 1] > t0) hi = mid; else lo = mid + 1;
        }
        // build mappings: forward pieces [si..], or reversed when rev
        struct Piece { int64_t handle, off, len, fs; };
        std::vector<Piece> pieces;
        int64_t cur = t0, si = lo, covered = 0;
        while (cur < t1) {
            int64_t send = step_text_pos[si + 1];
            int64_t take = std::min(t1, send) - cur;
            pieces.push_back({steps[si], cur - step_text_pos[si], take,
                              covered});
            covered += take;
            cur += take;
            si++;
        }
        pathbuf.clear();
        int64_t rank = 0;
        const int64_t n_pieces = (int64_t)pieces.size();
        for (int64_t pi = 0; pi < n_pieces; pi++) {
            const Piece& pc = rev ? pieces[n_pieces - 1 - pi] : pieces[pi];
            int64_t h = pc.handle, off = pc.off, len = pc.len;
            int64_t nid = node_id[h >> 1];
            int64_t nlen = seq_start[(h >> 1) + 1] - seq_start[h >> 1];
            bool mrev = (h & 1) != 0;
            if (rev) { mrev = !mrev; off = nlen - off - len; }
            // flipped-space interval of this piece within the read
            int64_t fs = rev ? (L - pc.fs - len) : pc.fs;
            rank++;
            mapbuf.clear();
            // position submessage (field 1)
            tmp.clear();
            tmp.resize(64);
            int64_t tp = 0;
            tp = put_tag(tmp.data(), tp, 1, 0);
            tp = put_varint(tmp.data(), tp, (uint64_t)nid);
            if (off) {
                tp = put_tag(tmp.data(), tp, 2, 0);
                tp = put_varint(tmp.data(), tp, (uint64_t)off);
            }
            if (mrev) {
                tp = put_tag(tmp.data(), tp, 4, 0);
                tmp[tp++] = 1;
            }
            mapbuf.push_back((1 << 3) | 2);
            {
                uint8_t vb[10];
                int64_t vp = put_varint(vb, 0, (uint64_t)tp);
                mapbuf.insert(mapbuf.end(), vb, vb + vp);
            }
            mapbuf.insert(mapbuf.end(), tmp.data(), tmp.data() + tp);
            // edits (field 2): runs of matches / mismatches over
            // flipped-space interval [fs, fs+len)
            int64_t e = fs;
            const int64_t fe = fs + len;
            while (e < fe) {
                // flipped mask value at position e: mask is oriented-space;
                // flipped index j maps to oriented index L-1-j when rev
                auto mis_at = [&](int64_t j) -> bool {
                    int64_t oi = rev ? (L - 1 - j) : j;
                    return mrow[oi] != 0;
                };
                bool state = mis_at(e);
                int64_t run_end = e + 1;
                while (run_end < fe && mis_at(run_end) == state) run_end++;
                int64_t n = run_end - e;
                tmp.clear();
                tmp.resize(32 + (state ? n : 0));
                int64_t ep = 0;
                ep = put_tag(tmp.data(), ep, 1, 0);
                ep = put_varint(tmp.data(), ep, (uint64_t)n);
                ep = put_tag(tmp.data(), ep, 2, 0);
                ep = put_varint(tmp.data(), ep, (uint64_t)n);
                if (state) {
                    ep = put_tag(tmp.data(), ep, 3, 2);
                    ep = put_varint(tmp.data(), ep, (uint64_t)n);
                    const uint8_t* rd = reads + read_off[i];
                    for (int64_t q = 0; q < n; q++)
                        tmp[ep++] = rd[e + q];
                }
                mapbuf.push_back((2 << 3) | 2);
                {
                    uint8_t vb[10];
                    int64_t vp = put_varint(vb, 0, (uint64_t)ep);
                    mapbuf.insert(mapbuf.end(), vb, vb + vp);
                }
                mapbuf.insert(mapbuf.end(), tmp.data(), tmp.data() + ep);
                e = run_end;
            }
            // rank (field 5)
            {
                uint8_t vb[16];
                int64_t vp = 0;
                vp = put_tag(vb, vp, 5, 0);
                vp = put_varint(vb, vp, (uint64_t)rank);
                mapbuf.insert(mapbuf.end(), vb, vb + vp);
            }
            // append mapping to path (field 2 of Path)
            pathbuf.push_back((2 << 3) | 2);
            {
                uint8_t vb[10];
                int64_t vp = put_varint(vb, 0, (uint64_t)mapbuf.size());
                pathbuf.insert(pathbuf.end(), vb, vb + vp);
            }
            pathbuf.insert(pathbuf.end(), mapbuf.begin(), mapbuf.end());
        }
        // assemble Alignment
        const int64_t name_len = name_off[i + 1] - name_off[i];
        const int64_t read_len = read_off[i + 1] - read_off[i];
        // refpos submessage
        tmp.clear();
        if (ref_path[i] >= 0) {
            const int64_t rn0 = refname_off[ref_path[i]];
            const int64_t rn1 = refname_off[ref_path[i] + 1];
            tmp.resize(32 + (rn1 - rn0));
            int64_t rp = 0;
            if (ref_off[i]) {
                rp = put_tag(tmp.data(), rp, 2, 0);
                rp = put_varint(tmp.data(), rp, (uint64_t)ref_off[i]);
            }
            if (ref_rev[i]) {
                rp = put_tag(tmp.data(), rp, 4, 0);
                tmp[rp++] = 1;
            }
            rp = put_tag(tmp.data(), rp, 5, 2);
            rp = put_varint(tmp.data(), rp, (uint64_t)(rn1 - rn0));
            for (int64_t q = rn0; q < rn1; q++) tmp[rp++] = refnames[q];
            tmp.resize(rp);
        }
        const int64_t qual_len = qual_off[i + 1] - qual_off[i];
        int64_t need = 1 + varint_size(read_len) + read_len
                     + (qual_len ? 12 + qual_len : 0)
                     + 1 + varint_size(pathbuf.size()) + pathbuf.size()
                     + 1 + varint_size(name_len) + name_len
                     + 12 + 12
                     + (tmp.empty() ? 0
                        : (2 + varint_size(tmp.size()) + (int64_t)tmp.size()))
                     + 10;  // identity double
        if (pos + need + 16 > out_cap) return -1;
        // sequence (field 1)
        pos = put_tag(out, pos, 1, 2);
        pos = put_varint(out, pos, (uint64_t)read_len);
        memcpy(out + pos, reads + read_off[i], read_len);
        pos += read_len;
        // path (field 2)
        pos = put_tag(out, pos, 2, 2);
        pos = put_varint(out, pos, (uint64_t)pathbuf.size());
        memcpy(out + pos, pathbuf.data(), pathbuf.size());
        pos += pathbuf.size();
        // name (field 3)
        if (name_len) {
            pos = put_tag(out, pos, 3, 2);
            pos = put_varint(out, pos, (uint64_t)name_len);
            memcpy(out + pos, names + name_off[i], name_len);
            pos += name_len;
        }
        // quality (field 4)
        {
            const int64_t ql = qual_off[i + 1] - qual_off[i];
            if (ql) {
                if (pos + ql + 12 > out_cap) return -1;
                pos = put_tag(out, pos, 4, 2);
                pos = put_varint(out, pos, (uint64_t)ql);
                memcpy(out + pos, quals + qual_off[i], ql);
                pos += ql;
            }
        }
        // mapping_quality (5), score (6)
        if (mapqs[i]) {
            pos = put_tag(out, pos, 5, 0);
            pos = put_varint(out, pos, (uint64_t)mapqs[i]);
        }
        if (scores[i]) {
            pos = put_tag(out, pos, 6, 0);
            pos = put_varint(out, pos, (uint64_t)scores[i]);
        }
        // identity (16, double)
        {
            int64_t mmc = 0;
            for (int64_t q = 0; q < L; q++) mmc += mrow[q] ? 1 : 0;
            double ident = L ? (double)(L - mmc) / (double)L : 0.0;
            pos = put_tag(out, pos, 16, 1);
            memcpy(out + pos, &ident, 8);
            pos += 8;
        }
        // refpos (19)
        if (!tmp.empty()) {
            pos = put_tag(out, pos, 19, 2);
            pos = put_varint(out, pos, (uint64_t)tmp.size());
            memcpy(out + pos, tmp.data(), tmp.size());
            pos += (int64_t)tmp.size();
        }
        rec_off[i + 1] = pos;
    }
    rec_off[N] = pos;
    return 0;
}

}  // extern "C"

extern "C" {

// Batch minimizer extraction over equal-length rows: reads (R, L)
// row-major. Outputs flat arrays + per-read counts. Caps at out_cap.
int64_t extract_minimizers_batch(const uint8_t* reads, int64_t R, int64_t L,
                                 int32_t k, int32_t w,
                                 int64_t* out_read, int64_t* out_offs,
                                 uint64_t* out_keys, uint8_t* out_rev,
                                 int64_t out_cap) {
    int64_t total = 0;
    for (int64_t r = 0; r < R; r++) {
        if (total + L > out_cap) return -1;
        const int64_t cnt = extract_minimizers(
            reads + r * L, L, k, w, out_offs + total, out_keys + total,
            out_rev + total);
        for (int64_t i = 0; i < cnt; i++) out_read[total + i] = r;
        total += cnt;
    }
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full batch seeding: minimizers -> index lookup (hit caps + soft-cap
// selection) -> diagonal clustering -> top-C candidate table, one C call
// per device batch. This is the host side of the giraffe seed stage
// (reference: MinimizerMapper::find_seeds src/minimizer_mapper.cpp:4100,
// hit caps :4349-4360, SnarlDistanceIndexClusterer collapsed to a
// (strand, diagonal) sort on the haplotype text). Mirrors
// GiraffeMapper._seed_batch element-for-element so the numpy path stays a
// drop-in fallback; OpenMP-parallel over reads (the reference fans out
// reads over OpenMP threads the same way, giraffe_main.cpp:2369).

#include <cmath>

namespace {

struct SeedRec {
    int64_t diag;
    int32_t roff;
    float score;
    uint8_t strand;
};

struct ClusterRec {
    int64_t diag;
    double score;
    uint8_t strand;
    int32_t order;   // creation order for stable ties
};

}  // namespace

// seed-stage time accumulators (ns, across threads), VGTPU_SEED_PROF=1
static std::atomic<int64_t> g_seed_extract_ns{0}, g_seed_lookup_ns{0},
    g_seed_cluster_ns{0}, g_seed_refproj_ns{0};

extern "C" {

void seed_prof(int64_t* out) {
    out[0] = g_seed_extract_ns.load();
    out[1] = g_seed_lookup_ns.load();
    out[2] = g_seed_cluster_ns.load();
    out[3] = g_seed_refproj_ns.load();
}

int64_t seed_batch(
    const uint8_t* codes2d, int64_t R, int64_t L, int32_t k, int32_t w,
    const uint64_t* idx_keys, int64_t n_keys, const int64_t* idx_offsets,
    const int64_t* pos_text, const uint8_t* pos_rev,
    int32_t hit_cap, int32_t hard_hit_cap, double score_fraction,
    int32_t C, int32_t band_radius,
    const int64_t* text_start, int64_t n_haps,
    const int64_t* step_text_pos, const int64_t* steps, int64_t n_steps,
    const int64_t* seq_start,
    const int32_t* node_ref_path, const int64_t* node_ref_off,
    int64_t T,
    // bucket accelerators (optional, may be null): key_bucket_off[b] =
    // first index in idx_keys with key >= (b << key_shift) — narrows the
    // 8M-entry binary search (~23 DRAM misses) to one small bucket;
    // step_bucket_off likewise over step_text_pos[1..n_steps]
    const int64_t* key_bucket_off, int32_t key_shift,
    const int64_t* step_bucket_off, int32_t step_shift,
    int32_t* cand_start, int32_t* cand_lo, int32_t* cand_hi,
    uint8_t* cand_rev, uint8_t* cand_valid,
    int32_t* cand_refpath, int64_t* cand_refoff) {
    const bool prof = std::getenv("VGTPU_SEED_PROF") != nullptr;
#pragma omp parallel
    {
        std::vector<int64_t> moffs(L);
        std::vector<uint64_t> mkeys(L);
        std::vector<uint8_t> mrev(L);
        std::vector<SeedRec> seeds;
        std::vector<ClusterRec> clusters;
        std::vector<int32_t> sel_order;
        std::vector<int64_t> seen_roff;
        int64_t t_ex = 0, t_lu = 0, t_cl = 0, t_rp = 0;
#pragma omp for schedule(dynamic, 16)
        for (int64_t r = 0; r < R; r++) {
            const int64_t pt0 = prof ? now_ns() : 0;
            int32_t* cs = cand_start + r * C;
            int32_t* clo = cand_lo + r * C;
            int32_t* chi = cand_hi + r * C;
            uint8_t* crev = cand_rev + r * C;
            uint8_t* cval = cand_valid + r * C;
            int32_t* crp = cand_refpath + r * C;
            int64_t* cro = cand_refoff + r * C;
            for (int32_t j = 0; j < C; j++) {
                cs[j] = clo[j] = chi[j] = 0;
                crev[j] = cval[j] = 0;
                crp[j] = -1;
                cro[j] = 0;
            }
            const int64_t cnt = extract_minimizers(
                codes2d + r * L, L, k, w, moffs.data(), mkeys.data(),
                mrev.data());
            const int64_t pt1 = prof ? now_ns() : 0;
            if (prof) t_ex += pt1 - pt0;
            if (cnt == 0) continue;

            // index lookup + hard cap + minimizer score
            // (score = 1 + ln(hard_cap) - ln(hits), floor 1.0)
            std::vector<int64_t> hs(cnt), cnts(cnt);
            std::vector<double> mscore(cnt);
            for (int64_t i = 0; i < cnt; i++) {
                const uint64_t* lo_p = idx_keys;
                const uint64_t* hi_p = idx_keys + n_keys;
                if (key_bucket_off) {
                    const uint64_t b = mkeys[i] >> key_shift;
                    lo_p = idx_keys + key_bucket_off[b];
                    hi_p = idx_keys + key_bucket_off[b + 1];
                }
                const uint64_t* p = std::lower_bound(lo_p, hi_p, mkeys[i]);
                int64_t ki = p - idx_keys;
                int64_t c = 0, s = 0;
                if (ki < n_keys && idx_keys[ki] == mkeys[i]) {
                    s = idx_offsets[ki];
                    c = idx_offsets[ki + 1] - s;
                }
                if (c > hard_hit_cap) c = 0;   // hard-capped out
                hs[i] = s;
                cnts[i] = c;
                mscore[i] = std::max(
                    1.0, 1.0 + std::log((double)hard_hit_cap)
                             - std::log(std::max<int64_t>(c, 1)));
                // quantize to 1/256 (index/minimizer.py
                // minimizer_score_table): cluster-score sums become
                // exact in f32 in any order, so host / XLA / Pallas
                // engines tie-break candidates identically
                mscore[i] = std::nearbyint(mscore[i] * 256.0) / 256.0;
            }
            const int64_t pt2 = prof ? now_ns() : 0;
            if (prof) t_lu += pt2 - pt1;
            // soft-cap selection in descending score order (stable)
            sel_order.clear();
            double total = 0.0;
            for (int64_t i = 0; i < cnt; i++)
                if (cnts[i] > 0) {
                    sel_order.push_back((int32_t)i);
                    total += mscore[i];
                }
            if (sel_order.empty()) continue;
            std::stable_sort(sel_order.begin(), sel_order.end(),
                             [&](int32_t a, int32_t b) {
                                 return mscore[a] > mscore[b];
                             });
            std::vector<uint8_t> take(cnt, 0);
            double taken = 0.0, budget = score_fraction * total;
            for (int32_t i : sel_order) {
                if (cnts[i] <= hit_cap || taken < budget) {
                    take[i] = 1;
                    taken += mscore[i];
                }
            }
            // expand hits -> seeds (original minimizer order)
            seeds.clear();
            for (int64_t i = 0; i < cnt; i++) {
                if (!take[i]) continue;
                for (int64_t x = 0; x < cnts[i]; x++) {
                    const int64_t h = hs[i] + x;
                    const uint8_t strand = pos_rev[h] != mrev[i];
                    const int64_t o = strand ? (L - k - moffs[i]) : moffs[i];
                    seeds.push_back(SeedRec{pos_text[h] - o, (int32_t)o,
                                            (float)mscore[i], strand});
                }
            }
            if (seeds.empty()) continue;
            std::stable_sort(seeds.begin(), seeds.end(),
                             [](const SeedRec& a, const SeedRec& b) {
                                 if (a.strand != b.strand)
                                     return a.strand < b.strand;
                                 return a.diag < b.diag;
                             });
            // cluster: split on strand change or diag gap > 2B
            clusters.clear();
            const int64_t gap = 2 * (int64_t)band_radius;
            size_t i0 = 0;
            for (size_t i = 1; i <= seeds.size(); i++) {
                const bool boundary =
                    i == seeds.size()
                    || seeds[i].strand != seeds[i0].strand
                    || seeds[i].diag - seeds[i - 1].diag > gap;
                if (!boundary) continue;
                // distinct read offsets only
                seen_roff.clear();
                double score = 0.0;
                for (size_t t = i0; t < i; t++) {
                    bool dup = false;
                    for (int64_t sr : seen_roff)
                        if (sr == seeds[t].roff) { dup = true; break; }
                    if (!dup) {
                        seen_roff.push_back(seeds[t].roff);
                        score += seeds[t].score;
                    }
                }
                const size_t mid = (i0 + (i - 1)) / 2;
                clusters.push_back(ClusterRec{seeds[mid].diag, score,
                                              seeds[i0].strand,
                                              (int32_t)clusters.size()});
                i0 = i;
            }
            std::stable_sort(clusters.begin(), clusters.end(),
                             [](const ClusterRec& a, const ClusterRec& b) {
                                 return a.score > b.score;
                             });
            const int64_t pt3 = prof ? now_ns() : 0;
            if (prof) t_cl += pt3 - pt2;
            const int32_t nc = std::min<int64_t>(clusters.size(), C);
            for (int32_t j = 0; j < nc; j++) {
                const ClusterRec& cl = clusters[j];
                const int64_t anchor =
                    std::min(std::max<int64_t>(cl.diag, 0), T - 1);
                const int64_t hap =
                    std::upper_bound(text_start + 1, text_start + 1 + n_haps,
                                     anchor) - (text_start + 1);
                const int64_t lo = text_start[hap], hi = text_start[hap + 1];
                cs[j] = (int32_t)(cl.diag - band_radius);
                clo[j] = (int32_t)lo;
                chi[j] = (int32_t)hi;
                crev[j] = cl.strand;
                cval[j] = 1;
                const int64_t a2 =
                    std::min(std::max(anchor, lo), hi - 1);
                const int64_t* sp_lo = step_text_pos + 1;
                const int64_t* sp_hi = step_text_pos + 1 + n_steps;
                if (step_bucket_off) {
                    const int64_t b = a2 >> step_shift;
                    sp_lo = step_text_pos + 1 + step_bucket_off[b];
                    sp_hi = step_text_pos + 1 + step_bucket_off[b + 1];
                }
                const int64_t si =
                    std::upper_bound(sp_lo, sp_hi, a2)
                    - (step_text_pos + 1);
                const int64_t h = steps[si];
                const int64_t nidx = h >> 1;
                const bool strev = h & 1;
                const int64_t nlen = seq_start[nidx + 1] - seq_start[nidx];
                const int64_t goff = a2 - step_text_pos[si];
                const int64_t fwd = strev ? (nlen - goff) : goff;
                crp[j] = node_ref_path[nidx];
                cro[j] = node_ref_off[nidx] + fwd;
            }
            if (prof) t_rp += now_ns() - pt3;
        }
        if (prof) {
            g_seed_extract_ns += t_ex;
            g_seed_lookup_ns += t_lu;
            g_seed_cluster_ns += t_cl;
            g_seed_refproj_ns += t_rp;
        }
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Score-only banded semiglobal DP for small host batches (paired rescue:
// tens-to-hundreds of candidates per batch — a device dispatch would pay
// full roundtrip latency and queue behind the main DP). Recurrence and
// scores identical to ops.align.banded_scores / banded_traceback above.

extern "C" {

void banded_scores_host(const uint8_t* reads, const uint8_t* wins,
                        int64_t n, int64_t L, int64_t TW, int32_t B,
                        int32_t match, int32_t mismatch, int32_t gap_open,
                        int32_t gap_extend, int32_t bonus,
                        const int32_t* rlen, int32_t* out) {
    const int64_t W = 2 * (int64_t)B + 1;
    const int64_t NEG = -(1LL << 40);
#pragma omp parallel
    {
        std::vector<int64_t> Hp(W), Fp(W), Hn_(W), Fn_(W);
#pragma omp for schedule(dynamic, 8)
        for (int64_t c = 0; c < n; c++) {
            const uint8_t* read = reads + c * L;
            const uint8_t* window = wins + c * TW;
            const int64_t rl = rlen[c];
            if (rl <= 0) { out[c] = -1; continue; }
            for (int64_t kk = 0; kk < W; kk++) { Hp[kk] = bonus; Fp[kk] = NEG; }
            int64_t best = 0;
            for (int64_t i = 1; i <= rl; i++) {
                const uint8_t rb = read[i - 1];
                int64_t rowmax = NEG, eprev = NEG, hn_prev = NEG;
                for (int64_t kk = 0; kk < W; kk++) {
                    const int64_t j = i - 1 + kk;
                    const uint8_t wb = (j < TW) ? window[j] : 6;
                    const int64_t sub = (wb == rb && rb < 4) ? match : -mismatch;
                    const int64_t diag = Hp[kk] + sub;
                    const int64_t sh = (kk + 1 < W) ? Hp[kk + 1] : NEG;
                    const int64_t sf = (kk + 1 < W) ? Fp[kk + 1] : NEG;
                    const int64_t fval = std::max(sh - gap_open, sf - gap_extend);
                    int64_t hn = std::max(diag, fval);
                    if (hn < 0) hn = 0;
                    int64_t eval = (kk == 0) ? NEG
                        : std::max(hn_prev - gap_open, eprev - gap_extend);
                    const int64_t hfin = std::max(hn, eval);
                    Hn_[kk] = hfin;
                    Fn_[kk] = fval;
                    eprev = eval;
                    hn_prev = hn;
                    if (hfin > rowmax) rowmax = hfin;
                }
                std::swap(Hp, Hn_);
                std::swap(Fp, Fn_);
                if (rowmax > best) best = rowmax;
                if (i == rl && rowmax + bonus > best) best = rowmax + bonus;
            }
            out[c] = (int32_t)best;
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Suffix array + maximal-exact-match finding over the haplotype text:
// the TPU-era answer to the GCSA2 MEM stack behind `vg map`
// (reference: BaseMapper::find_mems_deep src/mapper.hpp:210, src/mem.cpp;
// GCSA2 kmer suffix array). The haplotype text replaces the graph kmer
// index, so MEMs come from plain suffix-array search; graph coordinates
// are recovered the same way the giraffe path does.

namespace {

// SA-IS (Nong/Zhang/Chan induced sorting), linear time and memory:
// chromosome-scale haplotype texts (>= 1 Gbp) need a suffix array for
// the MEM fallback, and prefix doubling's O(n log^2 n) sort rounds take
// tens of minutes there. Generic over the (possibly recursed) alphabet.
template <typename T>
void sais_core(const T* s, int32_t* sa, int64_t n, int64_t K) {
    if (n == 1) { sa[0] = 0; return; }
    if (n == 2) {
        const bool le = s[0] <= s[1];
        sa[0] = le ? 0 : 1;
        sa[1] = le ? 1 : 0;
        // exact tie s[0]==s[1]: suffix 1 (shorter) sorts first
        if (s[0] == s[1]) { sa[0] = 1; sa[1] = 0; }
        return;
    }
    std::vector<bool> is_s(n);        // S-type suffix?
    is_s[n - 1] = true;
    for (int64_t i = n - 2; i >= 0; i--)
        is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);
    auto is_lms = [&](int64_t i) {
        return i > 0 && is_s[i] && !is_s[i - 1];
    };
    std::vector<int64_t> bkt(K + 1);
    auto bucket_ends = [&](bool ends) {
        std::fill(bkt.begin(), bkt.end(), 0);
        for (int64_t i = 0; i < n; i++) bkt[s[i]]++;
        int64_t sum = 0;
        for (int64_t c = 0; c <= K; c++) {
            sum += bkt[c];
            bkt[c] = ends ? sum : sum - bkt[c];
        }
    };
    auto induce = [&]() {
        // L-type left-to-right
        bucket_ends(false);
        for (int64_t i = 0; i < n; i++) {
            const int64_t j = sa[i] - 1;
            if (sa[i] > 0 && !is_s[j]) sa[bkt[s[j]]++] = (int32_t)j;
        }
        // S-type right-to-left
        bucket_ends(true);
        for (int64_t i = n - 1; i >= 0; i--) {
            const int64_t j = sa[i] - 1;
            if (sa[i] > 0 && is_s[j]) sa[--bkt[s[j]]] = (int32_t)j;
        }
    };
    // step 1: place LMS suffixes at bucket ends (arbitrary order), induce
    std::fill(sa, sa + n, -1);
    bucket_ends(true);
    for (int64_t i = n - 1; i >= 0; i--)
        if (is_lms(i)) sa[--bkt[s[i]]] = (int32_t)i;
    // the sentinel-free variant: treat position n-1 as the unique
    // smallest LMS by forcing it first (callers append a 0 sentinel
    // strictly smaller than all real symbols, so s[n-1]=0 is unique)
    induce();
    // step 2: name LMS substrings from their induced order
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; i++)
        if (is_lms(sa[i])) sa[n1++] = sa[i];
    int32_t* s1_area = sa + n1;
    std::fill(s1_area, sa + n, -1);
    int64_t name = -1;
    int64_t prev = -1;
    for (int64_t i = 0; i < n1; i++) {
        const int64_t pos = sa[i];
        bool diff = (prev < 0);
        if (!diff) {
            for (int64_t d = 0;; d++) {
                const bool lp = is_lms(pos + d), lq = is_lms(prev + d);
                if (d > 0 && lp && lq) break;      // both substrings ended
                if (s[pos + d] != s[prev + d] || lp != lq ||
                    pos + d == n - 1 || prev + d == n - 1) {
                    diff = (s[pos + d] != s[prev + d] || lp != lq);
                    break;
                }
            }
        }
        if (diff) { name++; prev = pos; }
        s1_area[(pos - 1) / 2] = (int32_t)name;
    }
    // compact names into s1 (LMS order by position); lms_pos aligns
    // with s1 because both scan positions in increasing order
    std::vector<int32_t> s1;
    s1.reserve(n1);
    std::vector<int32_t> lms_pos;
    lms_pos.reserve(n1);
    for (int64_t i = 1; i < n; i++)
        if (is_lms(i)) lms_pos.push_back((int32_t)i);
    for (int64_t i = 0; i < (n - 1) / 2 + 1; i++)
        if (s1_area[i] >= 0) s1.push_back(s1_area[i]);
    // step 3: recurse if names are not unique
    std::vector<int32_t> sa1(n1);
    if (name + 1 < n1) {
        sais_core<int32_t>(s1.data(), sa1.data(), n1, name);
    } else {
        for (int64_t i = 0; i < n1; i++) sa1[s1[i]] = (int32_t)i;
    }
    // step 4: place LMS suffixes in their true order, induce again
    std::fill(sa, sa + n, -1);
    bucket_ends(true);
    for (int64_t i = n1 - 1; i >= 0; i--) {
        const int64_t j = lms_pos[sa1[i]];
        sa[--bkt[s[j]]] = (int32_t)j;
    }
    induce();
}

}  // namespace

extern "C" {

// suffix array via SA-IS (linear; replaces the round-1..3 prefix
// doubling, whose O(n log^2 n) sort rounds were the 64 Mbp MEM-fallback
// scale ceiling). A 0 sentinel column is appended internally so every
// real symbol is >= 1 and the last suffix is the unique minimum.
int64_t build_suffix_array(const uint8_t* text, int64_t n, int32_t* sa) {
    if (n <= 0) return 0;
    if (n == 1) { sa[0] = 0; return 0; }
    // shift symbols up by 1 and append sentinel 0
    std::vector<uint8_t> s(n + 1);
    for (int64_t i = 0; i < n; i++) s[i] = (uint8_t)(text[i] + 1);
    s[n] = 0;
    std::vector<int32_t> sa_full(n + 1);
    sais_core<uint8_t>(s.data(), sa_full.data(), n + 1, 256);
    // drop the sentinel suffix (always first)
    for (int64_t i = 0; i < n; i++) sa[i] = sa_full[i + 1];
    return 0;
}

namespace {

// longest common prefix of pattern p (length m) vs text suffix at s
inline int64_t lcp_at(const uint8_t* text, int64_t n, int64_t s,
                      const uint8_t* p, int64_t m) {
    int64_t l = 0;
    const int64_t lim = std::min(m, n - s);
    while (l < lim && text[s + l] == p[l]) l++;
    return l;
}

// SA range of pattern p[0..m) via binary search; returns (lo, hi)
inline void sa_range(const uint8_t* text, int64_t n, const int32_t* sa,
                     const uint8_t* p, int64_t m, int64_t* out_lo,
                     int64_t* out_hi) {
    // lower bound: first suffix >= p
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        const int64_t mid = (lo + hi) / 2;
        const int64_t s = sa[mid];
        const int64_t l = lcp_at(text, n, s, p, m);
        const bool less =
            (l < m) && (s + l >= n || text[s + l] < p[l]);
        if (less) lo = mid + 1; else hi = mid;
    }
    const int64_t start = lo;
    // upper bound: first suffix with prefix > p
    hi = n;
    while (lo < hi) {
        const int64_t mid = (lo + hi) / 2;
        const int64_t s = sa[mid];
        const int64_t l = lcp_at(text, n, s, p, m);
        const bool greater = (l < m) && (s + l < n && text[s + l] > p[l]);
        if (greater) hi = mid; else lo = mid + 1;
    }
    *out_lo = start;
    *out_hi = hi;
}

}  // namespace

// MEMs of one read vs the text. For each read start i, the longest
// exact match read[i:i+l] with l >= min_len and SA occurrence count in
// (0, max_hits]; emits (read_start, length, text positions...) capped.
// Maximality: runs are emitted only when not contained in the previous
// one (l_{i+1} >= l_i - 1 containment property prunes duplicates).
// Returns number of (mem, position) rows written.
// emit_over_cap: when a MEM's occurrence count exceeds max_hits, emit
// ONE sentinel row (read_start, length, -count) instead of dropping it
// silently — the sharded-index merge needs every chunk's count to
// reproduce the single-SA repetitive filter globally (a per-chunk cap
// would re-admit globally repetitive MEMs).
int64_t find_mems(const uint8_t* text, int64_t n, const int32_t* sa,
                  const uint8_t* read, int64_t L,
                  int32_t min_len, int32_t max_hits, int64_t out_cap,
                  int32_t* out_read_start, int32_t* out_len,
                  int64_t* out_text_pos, int32_t emit_over_cap) {
    int64_t rows = 0;
    int64_t prev_end = -1;
    for (int64_t i = 0; i + min_len <= L; i++) {
        // grow the match greedily. The range for length l+1 is a
        // sub-range of the range for length l (all member suffixes
        // share the first l pattern chars), so each growth step is two
        // binary searches comparing ONLY the char at offset l — the
        // previous full-prefix sa_range per step was O(log n * lcp)
        // and dominated chromosome-scale MEM queries.
        int64_t l = 0, lo = 0, hi = n;
        while (i + l < L && read[i + l] < 4) {
            const uint8_t c = read[i + l];
            // within [lo,hi): first suffix whose char at offset l is
            // >= c / > c (suffixes shorter than l+1 sort first)
            auto ch = [&](int64_t x) -> int32_t {
                const int64_t s = (int64_t)sa[x] + l;
                return s < n ? (int32_t)text[s] : -1;
            };
            int64_t a = lo, b = hi;
            while (a < b) {
                const int64_t mid = (a + b) >> 1;
                if (ch(mid) < (int32_t)c) a = mid + 1; else b = mid;
            }
            const int64_t nlo = a;
            b = hi;
            while (a < b) {
                const int64_t mid = (a + b) >> 1;
                if (ch(mid) <= (int32_t)c) a = mid + 1; else b = mid;
            }
            if (nlo >= a) break;
            lo = nlo; hi = a; l++;
        }
        if (l < min_len) continue;
        if (i + l <= prev_end) continue;      // contained in previous MEM
        prev_end = i + l;
        const int64_t cnt = hi - lo;
        if (cnt > max_hits) {                  // repetitive
            if (emit_over_cap && rows < out_cap) {
                out_read_start[rows] = (int32_t)i;
                out_len[rows] = (int32_t)l;
                out_text_pos[rows] = -cnt;     // count sentinel
                rows++;
            }
            continue;
        }
        for (int64_t x = lo; x < hi && rows < out_cap; x++) {
            out_read_start[rows] = (int32_t)i;
            out_len[rows] = (int32_t)l;
            out_text_pos[rows] = sa[x];
            rows++;
        }
        if (rows >= out_cap) break;
    }
    return rows;
}

// MEM queries for MANY oriented reads against one SA in one call,
// OpenMP over reads (the chromosome-scale MEM fallback queries every
// shard for every zero-candidate read; per-read ctypes calls wasted
// the host cores). Outputs per read r land in out_*[r * out_cap_per ..];
// n_rows[r] = rows written.
int64_t find_mems_many(const uint8_t* text, int64_t n, const int32_t* sa,
                       const uint8_t* reads, int64_t Lmax,
                       const int64_t* rlen, int64_t n_reads,
                       int32_t min_len, int32_t max_hits,
                       int64_t out_cap_per,
                       int32_t* out_read_start, int32_t* out_len,
                       int64_t* out_text_pos, int64_t* n_rows,
                       int32_t emit_over_cap) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t r = 0; r < n_reads; r++) {
        n_rows[r] = find_mems(
            text, n, sa, reads + r * Lmax, rlen[r], min_len, max_hits,
            out_cap_per, out_read_start + r * out_cap_per,
            out_len + r * out_cap_per, out_text_pos + r * out_cap_per,
            emit_over_cap);
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Long-read anchor chaining DP (reference algorithms/chain_items.cpp
// chain_items_dp): colinear chaining over text-sorted anchors with a
// bounded lookback window. The Python loop over anchors was the
// long-read throughput bottleneck; this is the same DP in one call.

extern "C" {

void chain_anchors_dp(const int64_t* roff, const int64_t* tpos,
                      const double* ascore, int64_t n, int32_t J,
                      int32_t k, int64_t max_lookback, int64_t max_indel,
                      double gap_scale, double gap_open,
                      double* f, int64_t* parent) {
    for (int64_t i = 0; i < n; i++) {
        f[i] = ascore[i];
        parent[i] = -1;
    }
    for (int64_t i = 1; i < n; i++) {
        const int64_t j0 = std::max<int64_t>(0, i - J);
        double best = f[i];
        int64_t barg = -1;
        for (int64_t j = j0; j < i; j++) {
            const int64_t dt = tpos[i] - tpos[j];
            const int64_t dr = roff[i] - roff[j];
            if (dr <= 0 || dt <= 0 || dt > max_lookback) continue;
            const int64_t gap = std::llabs(dt - dr);
            if (gap > max_indel) continue;
            const double gain =
                (double)std::min<int64_t>(std::min(dr, dt), k);
            const double cost = gap > 0 ? gap_open + gap_scale * gap : 0.0;
            const double val = f[j] + gain - cost;
            if (val > best) { best = val; barg = j; }
        }
        if (barg >= 0) { f[i] = best; parent[i] = barg; }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched link alignment for the long-read stitcher: one call aligns all
// inter-anchor links of a read (or batch), with edits merged into runs
// in C++ — the per-link ctypes + Python merge overhead dominated
// long-read throughput. Output runs are (op, len, read_start) triples in
// FORWARD order; op 0=M 1=X 2=I 3=D; read_start = -1 for D.

extern "C" {

int64_t global_align_batch(
    const uint8_t* abuf, const int64_t* aoff,
    const uint8_t* bbuf, const int64_t* boff, int64_t n_links,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_extend,
    int64_t max_cells,
    int32_t* out_scores,          // (n_links,)
    int8_t* out_ok,               // (n_links,) 1 = aligned
    int32_t* runs_buf,            // (runs_cap * 3,)
    int64_t runs_cap,
    int64_t* runs_off) {          // (n_links + 1,)
    // scratch per thread for unit triples
    int64_t pos = 0;
    runs_off[0] = 0;
    for (int64_t li = 0; li < n_links; li++) {
        const uint8_t* a = abuf + aoff[li];
        const int64_t la = aoff[li + 1] - aoff[li];
        const uint8_t* b = bbuf + boff[li];
        const int64_t lb = boff[li + 1] - boff[li];
        out_ok[li] = 0;
        out_scores[li] = 0;
        std::vector<int32_t> units(3 * (2 * (la + lb) + 16));
        int64_t n_units = 0;
        const int64_t sc = global_align(a, la, b, lb, match, mismatch,
                                        gap_open, gap_extend, max_cells,
                                        units.data(),
                                        2 * (la + lb) + 16, &n_units);
        if (n_units < 0) { runs_off[li + 1] = pos; continue; }
        // units are reversed unit ops; merge into forward runs
        int64_t start = pos;
        for (int64_t u = n_units - 1; u >= 0; u--) {
            const int32_t op = units[u * 3];
            const int32_t rp = units[u * 3 + 2];
            if (pos > start && runs_buf[(pos - 1) * 3] == op) {
                runs_buf[(pos - 1) * 3 + 1] += 1;
                continue;
            }
            if (pos >= runs_cap) return -1;   // caller grows the buffer
            runs_buf[pos * 3] = op;
            runs_buf[pos * 3 + 1] = 1;
            runs_buf[pos * 3 + 2] = (op == 3) ? -1 : rp;
            pos++;
        }
        out_scores[li] = (int32_t)sc;
        out_ok[li] = 1;
        runs_off[li + 1] = pos;
    }
    return pos;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Long-read chain stitching (native port of map/longread.py _stitch et al.,
// reference role: MinimizerMapper::map_from_chains alignment phase,
// src/minimizer_mapper_from_chains.cpp:708). One call per read batch;
// OpenMP over reads. Per chain: merge anchors into exact blocks, align
// inter-block links (Hamming fast path / global affine DP), apply the WFA
// error-model chimera guard, split at broken links, stitch each segment
// with banded semiglobal tails, keep the best segment. Output: merged edit
// runs (op, len, oriented_read_pos) + geometry per chain.

// stage-time accumulators for the long-read pipeline (ns, across all
// threads), enabled by VGTPU_LR_PROF=1; read back via lr_prof()
static std::atomic<int64_t> g_lr_anchor_ns{0}, g_lr_chain_ns{0},
    g_lr_stitch_ns{0};
static std::atomic<int64_t> g_lr_link_ns{0}, g_lr_link_cells{0},
    g_lr_link_calls{0}, g_lr_tail_ns{0};




namespace lrstitch {

struct Run { int32_t op; int64_t len; int64_t rpos; };

struct RunVec {
    std::vector<Run> v;
    void add(int32_t op, int64_t len, int64_t rpos) {
        if (!v.empty() && v.back().op == op
            && (op == 0 || op == 3 || op == 1 || op == 2)
            && (op == 3 || v.back().rpos + v.back().len == rpos)) {
            v.back().len += len;
            return;
        }
        v.push_back({op, len, rpos});
    }
};

struct LinkRes {
    bool ok = false;
    int64_t score = 0;
    int64_t matches = 0;
    std::vector<Run> runs;
};

struct Scratch {
    std::vector<int32_t> edits;
    std::vector<uint8_t> win;
    std::vector<uint8_t> rc;
};

struct Params {
    int32_t match, mismatch, gap_open, gap_extend, bonus, k, tail_band;
    int32_t x_drop;    // tail DP early exit; 0 = fill the full band
    int64_t max_link_len, max_tail, max_cells;
    double lm_base, lm_per_base, lm_cap, lg_base, lg_per_base, lg_cap;
};

inline int64_t hap_of(const int64_t* hs, int64_t H, int64_t pos) {
    // last h with hs[h] <= pos (hs has H+1 entries)
    int64_t lo = 0, hi = H;
    while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (hs[mid + 1] > pos) hi = mid; else lo = mid + 1;
    }
    return lo;
}

inline bool link_ok(int64_t mism, int64_t gapb, int64_t link_len,
                    const Params& p) {
    if (link_len < 30) return true;
    double max_m = 4.0 * std::min(p.lm_cap,
                                  p.lm_base + p.lm_per_base * link_len);
    double max_g = 4.0 * std::min(p.lg_cap,
                                  p.lg_base + p.lg_per_base * link_len);
    if (mism + gapb > link_len / 2) return false;
    return mism <= max_m && gapb <= max_g;
}

// diagonal fast path of a link (equal lengths, <= 2 mismatches — the
// diagonal is provably optimal, see map/longread.py); returns true when
// it resolved the link. MUST stay the one implementation: the
// collect-links pass and the stitch pass both classify links through it
void link_fast_clear(LinkRes& res) {
    res.ok = false;
    res.runs.clear();
    res.matches = 0;
}

bool link_fast(const uint8_t* a, int64_t la, const uint8_t* b, int64_t lb,
               int64_t ra, const Params& p, LinkRes& res) {
    link_fast_clear(res);
    if (la != lb) return false;
    if (la == 0) { res.ok = true; res.score = 0; return true; }
    int64_t nm = 0;
    for (int64_t i = 0; i < la; i++)
        if (a[i] != b[i] || a[i] >= 4) nm++;
    if (nm > 2) return false;
    RunVec rv;
    int64_t cur = 0;
    for (int64_t i = 0; i < la && nm; i++) {
        if (a[i] != b[i] || a[i] >= 4) {
            if (i > cur) rv.add(0, i - cur, ra + cur);
            rv.add(1, 1, ra + i);
            cur = i + 1;
        }
    }
    if (cur < la) rv.add(0, la - cur, ra + cur);
    res.ok = true;
    res.score = (la - nm) * p.match - nm * p.mismatch;
    res.matches = la - nm;
    res.runs = std::move(rv.v);
    return true;
}

// resolved slow links (device DP results or any precomputed table):
// forward-merged (op, len) runs per task, consumed in traversal order
struct LinkResolver {
    const int64_t* scores;
    const uint8_t* ok;
    const int32_t* runs;        // (op, len, unused) triples
    const int64_t* runs_off;    // per task
    int64_t cursor;             // task index (per chain, set by caller)
};

// rebuild a LinkRes from a resolver entry — same run construction and
// link_ok gate as align_link's slow path
void link_from_resolver(int64_t ra, int64_t la, int64_t lb,
                        const Params& p, LinkResolver* rsv, LinkRes& res) {
    const int64_t t = rsv->cursor++;
    link_fast_clear(res);
    if (!rsv->ok[t]) return;
    int64_t mism = 0, gapb = 0, cur = ra;
    RunVec rv;
    for (int64_t r = rsv->runs_off[t]; r < rsv->runs_off[t + 1]; r++) {
        const int32_t op = rsv->runs[r * 3];
        const int64_t len = rsv->runs[r * 3 + 1];
        for (int64_t u = 0; u < len; u++) {
            rv.add(op, 1, cur);
            if (op != 3) cur++;
        }
        if (op == 0) res.matches += len;
        else if (op == 1) mism += len;
        else gapb += len;
    }
    if (!link_ok(mism, gapb, std::max(la, lb), p)) {
        res.matches = 0;
        return;
    }
    res.ok = true;
    res.score = rsv->scores[t];
    res.runs = std::move(rv.v);
}

// align one link a (read part) vs b (text part); fills res
void align_link(const uint8_t* a, int64_t la, const uint8_t* b, int64_t lb,
                int64_t ra, const Params& p, Scratch& sc, LinkRes& res) {
    if (link_fast(a, la, b, lb, ra, p, res)) return;
    static const bool prof_link = std::getenv("VGTPU_LR_PROF") != nullptr;
    if (prof_link) {
        g_lr_link_cells += la * lb;   // slow-path DP cells only
        g_lr_link_calls += 1;         // slow-path calls only
    }
    int64_t cap = 2 * (la + lb) + 16;
    if ((int64_t)sc.edits.size() < cap * 3) sc.edits.resize(cap * 3);
    int64_t n_edits = 0;
    int64_t score = global_align(a, la, b, lb, p.match, p.mismatch,
                                 p.gap_open, p.gap_extend, p.max_cells,
                                 sc.edits.data(), cap, &n_edits);
    if (n_edits < 0) return;
    // unit edits in traceback order -> forward merged runs
    RunVec rv;
    int64_t mism = 0, gapb = 0, rpos = ra;
    for (int64_t e = n_edits - 1; e >= 0; e--) {
        int32_t op = sc.edits[e * 3];
        if (op == 0) { rv.add(0, 1, rpos); res.matches++; rpos++; }
        else if (op == 1) { rv.add(1, 1, rpos); mism++; rpos++; }
        else if (op == 2) { rv.add(2, 1, rpos); gapb++; rpos++; }
        else { rv.add(3, 1, rpos); gapb++; }
    }
    if (!link_ok(mism, gapb, std::max(la, lb), p)) return;
    res.ok = true;
    res.score = score;
    res.runs = std::move(rv.v);
}

struct TailRes {
    bool ok = false;
    int64_t score = 0, matches = 0;
    std::vector<Run> runs;   // forward oriented order
    int64_t read_lo = 0;     // left tail: oriented read start after clip
    int64_t read_hi = 0;     // right tail: oriented read end
    int64_t text_lo = 0, text_hi = 0;
};

// left tail of oriented[0:r0) against text ending at t0 (bounds [lo_b, .))
void left_tail(const uint8_t* oriented, int64_t r0, const uint8_t* text,
               int64_t t0, int64_t lo_b, const Params& p, Scratch& sc,
               TailRes& out) {
    out.ok = false;
    if (r0 == 0 || r0 > p.max_tail) return;
    int64_t n = r0;
    int64_t B = std::min<int64_t>(p.tail_band, std::max<int64_t>(n / 2, 8));
    int64_t wlo = std::max<int64_t>(std::max<int64_t>(t0 - n - B, lo_b), 0);
    int64_t TW = n + 2 * B;
    sc.win.assign(TW, 6);
    for (int64_t q = 0; q < std::min(TW, t0 - wlo); q++)
        sc.win[q] = text[t0 - 1 - q];               // reversed window
    sc.rc.resize(n);
    for (int64_t q = 0; q < n; q++) sc.rc[q] = oriented[n - 1 - q];
    int64_t cap = 2 * (n + TW) + 16;
    if ((int64_t)sc.edits.size() < cap * 3) sc.edits.resize(cap * 3);
    int64_t spans[4] = {0, 0, 0, 0}, n_edits = 0, nmatch = 0;
    int64_t score = banded_traceback(
        sc.rc.data(), n, sc.win.data(), TW, (int32_t)B, p.match, p.mismatch,
        p.gap_open, p.gap_extend, p.bonus, spans, sc.edits.data(), cap,
        &n_edits, &nmatch, p.x_drop);
    if (score <= 0 || n_edits < 0 || spans[0] != 0 || spans[2] != 0) return;
    int64_t read_end = spans[1];                    // reversed space
    int64_t consumed = spans[3] - spans[2];
    score -= p.bonus;                               // junction row bonus
    if (read_end == n) score -= p.bonus;            // re-awarded by stitcher
    // push order == oriented ascending (double reversal); rpos tracked
    RunVec rv;
    int64_t rpos = r0 - read_end;
    for (int64_t e = 0; e < n_edits; e++) {
        int32_t op = sc.edits[e * 3];
        if (op == 3) rv.add(3, 1, rpos);
        else { rv.add(op, 1, rpos); rpos++; }
    }
    out.ok = true;
    out.score = score;
    out.matches = nmatch;
    out.runs = std::move(rv.v);
    out.read_lo = r0 - read_end;
    out.text_lo = t0 - consumed;
}

// right tail of oriented[cur_r:L) against text from cur_t (bounds [., hi_b))
void right_tail(const uint8_t* oriented, int64_t L, int64_t cur_r,
                const uint8_t* text, int64_t cur_t, int64_t hi_b,
                const Params& p, Scratch& sc, TailRes& out) {
    out.ok = false;
    if (cur_r >= L) return;
    int64_t n = L - cur_r;
    if (n > p.max_tail) return;
    int64_t B = std::min<int64_t>(p.tail_band, std::max<int64_t>(n / 2, 8));
    int64_t wend = std::min(cur_t + n + B, hi_b);
    int64_t TW = n + 2 * B;
    sc.win.assign(TW, 6);
    for (int64_t q = 0; q < std::min(TW, wend - cur_t); q++)
        sc.win[q] = text[cur_t + q];
    int64_t cap = 2 * (n + TW) + 16;
    if ((int64_t)sc.edits.size() < cap * 3) sc.edits.resize(cap * 3);
    int64_t spans[4] = {0, 0, 0, 0}, n_edits = 0, nmatch = 0;
    int64_t score = banded_traceback(
        oriented + cur_r, n, sc.win.data(), TW, (int32_t)B, p.match,
        p.mismatch, p.gap_open, p.gap_extend, p.bonus, spans,
        sc.edits.data(), cap, &n_edits, &nmatch, p.x_drop);
    if (score <= 0 || n_edits < 0 || spans[0] != 0 || spans[2] != 0) return;
    score -= p.bonus;
    if (spans[1] == n) score -= p.bonus;
    RunVec rv;
    int64_t rpos = cur_r + spans[1];
    for (int64_t e = n_edits - 1; e >= 0; e--) {    // traceback -> forward
        int32_t op = sc.edits[e * 3];
        (void)rpos;
        if (op == 3) rv.add(3, 1, 0);
        else rv.add(op, 1, 0);
    }
    // recompute rpos forward (cleaner than reverse bookkeeping)
    {
        int64_t rp = cur_r;
        for (auto& r : rv.v) {
            r.rpos = rp;
            if (r.op != 3) rp += r.len;
        }
    }
    out.ok = true;
    out.score = score;
    out.matches = nmatch;
    out.runs = std::move(rv.v);
    out.read_hi = cur_r + spans[1];
    out.text_hi = cur_t + (spans[3] - spans[2]);
}

struct Block { int64_t r, t, l; };

// merge chain anchors into exact diagonal blocks (shared by stitch_chain
// and the collect-links pass)
static void build_blocks(const int64_t* roffs, const int64_t* tposs,
                         int64_t na, int64_t k,
                         std::vector<Block>& blocks) {
    for (int64_t ai = 0; ai < na; ai++) {
        int64_t r = roffs[ai], t = tposs[ai];
        if (!blocks.empty()) {
            Block& b = blocks.back();
            if (t - b.t == r - b.r && r <= b.r + b.l) {
                b.l = std::max(b.l, r - b.r + k);
                continue;
            }
            if (r < b.r + b.l || t < b.t + b.l) {
                int64_t trim = std::max(b.r + b.l - r, b.t + b.l - t);
                if (trim >= k) continue;
                blocks.push_back({r + trim, t + trim, k - trim});
                continue;
            }
        }
        blocks.push_back({r, t, k});
    }
}

struct ChainResult {
    bool ok = false;
    int64_t score = 0, matches = 0, read_start = 0, read_end = 0;
    int64_t t0 = 0, t1 = 0;
    std::vector<Run> runs;
};


// one read's anchors -> chain DP -> kept chains, factored from
// longread_map_batch so the chains-export / stitch-with-resolver
// two-pass entries (device link offload) reuse it verbatim —
// cross-pass determinism depends on this single implementation
struct CRec {
    double cscore; uint8_t rev;
    std::vector<int64_t> ro, tp;
};

static void chains_for_read(
    const uint8_t* codes, int64_t L,
    const uint64_t* idx_keys, const int64_t* idx_offsets, int64_t n_keys,
    const int64_t* pos_text, const uint8_t* pos_rev, int32_t k, int32_t w,
    int32_t hard_hit_cap, int32_t max_seeds_per_window,
    int32_t downsample_window, int32_t lookback_cands,
    int64_t max_lookback, int64_t max_indel, double gap_scale,
    double chain_gap_open, double min_chain_score, int64_t max_slots_,
    double chain_frac, const int64_t* key_bucket_off, int32_t key_shift,
    std::vector<int64_t>& offs, std::vector<uint64_t>& keys,
    std::vector<uint8_t>& crev, std::vector<CRec>& chains,
    int64_t* t_anchor_done) {
    chains.clear();
    if (L < k) return;
    const int64_t m = L - k + 1;
    offs.resize(m); keys.resize(m); crev.resize(m);
    int64_t nm = extract_minimizers(codes, L, k, w, offs.data(),
                                    keys.data(), crev.data());
    if (nm == 0) return;
    // lookup + hard cap
    struct Min { int64_t off, hs, he, cnt; uint8_t cr; };
    std::vector<Min> mins;
    mins.reserve(nm);
    for (int64_t i = 0; i < nm; i++) {
        // lower_bound over sorted keys (bucket-narrowed)
        const uint64_t key = keys[i];
        int64_t lo = 0, hi = n_keys;
        if (key_bucket_off) {
            lo = key_bucket_off[key >> key_shift];
            hi = key_bucket_off[(key >> key_shift) + 1];
        }
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (idx_keys[mid] < key) lo = mid + 1; else hi = mid;
        }
        if (lo >= n_keys || idx_keys[lo] != key) continue;
        int64_t hs = idx_offsets[lo], he = idx_offsets[lo + 1];
        int64_t cnt = he - hs;
        if (cnt <= 0 || cnt > hard_hit_cap) continue;
        mins.push_back({offs[i], hs, he, cnt, crev[i]});
    }
    if (mins.empty()) return;
    // repetitive-region Viterbi flags over read-ordered
    // minimizers (reference flag_repetitive_minimizers,
    // src/minimizer_mapper.cpp: switch 0.1, emit-same 0.9)
    std::vector<uint8_t> rep(mins.size(), 0);
    {
        const double sw = std::log(0.1), nsw = std::log(0.9);
        const double ediff = std::log(0.1), esame = std::log(0.9);
        double s_rep = std::log(0.05), s_uni = std::log(0.95);
        std::vector<uint8_t> prev_rep(mins.size()),
            prev_uni(mins.size());
        for (size_t i = 0; i < mins.size(); i++) {
            double e_uni = mins[i].cnt == 1 ? esame : ediff;
            double e_rep = mins[i].cnt == 1 ? ediff : esame;
            double r2u = s_rep + sw + e_uni;
            double u2u = s_uni + nsw + e_uni;
            double r2r = s_rep + nsw + e_rep;
            double u2r = s_uni + sw + e_rep;
            double su, sr;
            if (r2u > u2u) { su = r2u; prev_uni[i] = 1; }
            else { su = u2u; prev_uni[i] = 0; }
            if (r2r >= u2r) { sr = r2r; prev_rep[i] = 1; }
            else { sr = u2r; prev_rep[i] = 0; }
            s_rep = sr; s_uni = su;
        }
        uint8_t state = s_rep > s_uni ? 1 : 0;
        for (int64_t i = (int64_t)mins.size() - 1; i >= 0; i--) {
            rep[i] = state;
            state = state ? prev_rep[i] : prev_uni[i];
        }
    }
    // per-window downsample: keep the max_seeds_per_window
    // lowest-count minimizers per window (stable by offset);
    // repetitive-region minimizers get a quota of 1
    std::vector<int64_t> order(mins.size());
    for (size_t i = 0; i < mins.size(); i++) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
        [&](int64_t a, int64_t b) {
            int64_t wa = mins[a].off / downsample_window;
            int64_t wb = mins[b].off / downsample_window;
            if (wa != wb) return wa < wb;
            return mins[a].cnt < mins[b].cnt;
        });
    std::vector<uint8_t> keep(mins.size(), 0);
    {
        int64_t cur_w = -1, rank = 0;
        for (int64_t oi : order) {
            int64_t ww = mins[oi].off / downsample_window;
            if (ww != cur_w) { cur_w = ww; rank = 0; }
            int32_t quota = rep[oi] ? 1 : max_seeds_per_window;
            if (rank < quota) keep[oi] = 1;
            rank++;
        }
    }
    // expand anchors per strand
    struct Anc { int64_t roff, tpos; double score; };
    std::vector<Anc> anc[2];
    const double logcap = std::log((double)hard_hit_cap);
    for (size_t i = 0; i < mins.size(); i++) {
        if (!keep[i]) continue;
        const Min& mn = mins[i];
        double sc_a = std::min(
            1.0 + logcap - std::log((double)std::max<int64_t>(
                mn.cnt, 1)), 10.0) + k * 0.5;
        for (int64_t h = mn.hs; h < mn.he; h++) {
            bool strand = (pos_rev[h] != 0) != (mn.cr != 0);
            int64_t ro = strand ? (L - k - mn.off) : mn.off;
            anc[strand ? 1 : 0].push_back({ro, pos_text[h], sc_a});
        }
    }
    if (t_anchor_done) *t_anchor_done = now_ns();
    // per strand: sort by (tpos, roff), chain DP, greedy extract
    for (int s = 0; s < 2; s++) {
        auto& a = anc[s];
        int64_t n = (int64_t)a.size();
        if (!n) continue;
        std::stable_sort(a.begin(), a.end(),
            [](const Anc& x, const Anc& y) {
                if (x.tpos != y.tpos) return x.tpos < y.tpos;
                return x.roff < y.roff;
            });
        std::vector<int64_t> ro(n), tp(n), parent(n);
        std::vector<double> as(n), f(n);
        for (int64_t i = 0; i < n; i++) {
            ro[i] = a[i].roff; tp[i] = a[i].tpos; as[i] = a[i].score;
        }
        int32_t J = (int32_t)std::min<int64_t>(
            lookback_cands, std::max<int64_t>(n - 1, 1));
        chain_anchors_dp(ro.data(), tp.data(), as.data(), n, J, k,
                         max_lookback, max_indel, gap_scale,
                         chain_gap_open, f.data(), parent.data());
        // greedy non-overlapping extraction by descending score
        std::vector<int64_t> tips(n);
        for (int64_t i = 0; i < n; i++) tips[i] = i;
        std::stable_sort(tips.begin(), tips.end(),
            [&](int64_t x, int64_t y) { return f[x] > f[y]; });
        std::vector<uint8_t> used(n, 0);
        int64_t got = 0;
        for (int64_t tip : tips) {
            if (got >= max_slots_) break;
            if (used[tip] || f[tip] < min_chain_score) continue;
            std::vector<int64_t> walk;
            int64_t i = tip;
            bool clean = true;
            while (i >= 0) {
                if (used[i]) { clean = false; break; }
                walk.push_back(i);
                i = parent[i];
            }
            if (!clean || walk.empty()) continue;
            std::reverse(walk.begin(), walk.end());
            for (int64_t q : walk) used[q] = 1;
            CRec c;
            c.cscore = f[tip];
            c.rev = (uint8_t)s;
            c.ro.reserve(walk.size());
            c.tp.reserve(walk.size());
            for (int64_t q : walk) {
                c.ro.push_back(ro[q]);
                c.tp.push_back(tp[q]);
            }
            chains.push_back(std::move(c));
            got++;
        }
    }
    if (chains.empty()) return;
    std::stable_sort(chains.begin(), chains.end(),
        [](const CRec& x, const CRec& y) {
            return x.cscore > y.cscore;
        });
    if ((int64_t)chains.size() > max_slots_)
        chains.resize(max_slots_);
    // chain-score fraction filter (keep the best always)
    {
        size_t wkeep = 1;
        for (size_t q = 1; q < chains.size(); q++)
            if (chains[q].cscore >= chain_frac * chains[0].cscore) {
                if (q != wkeep)
                    chains[wkeep] = std::move(chains[q]);
                wkeep++;
            }
        chains.resize(wkeep);
    }
}

// merge anchors -> blocks -> links -> segments -> best segment (the whole
// per-chain stitch; shared by longread_stitch_batch and the fused
// longread_map_batch)
void stitch_chain(const uint8_t* oriented, int64_t L,
                  const int64_t* roffs, const int64_t* tposs, int64_t na,
                  const uint8_t* text, const int64_t* hap_starts,
                  int64_t n_haps, const Params& p, Scratch& sc,
                  ChainResult& out, LinkResolver* rsv = nullptr) {
    out.ok = false;
    if (na <= 0) return;
    std::vector<Block> blocks;
    build_blocks(roffs, tposs, na, p.k, blocks);
    int64_t nb = (int64_t)blocks.size();
    std::vector<LinkRes> links(std::max<int64_t>(nb - 1, 0));
    int64_t hap = hap_of(hap_starts, n_haps, blocks[0].t);
    int64_t lo_b = hap_starts[hap], hi_b = hap_starts[hap + 1];
    static const bool prof_fine = std::getenv("VGTPU_LR_PROF") != nullptr;
    for (int64_t bi = 0; bi + 1 < nb; bi++) {
        const Block& pb = blocks[bi];
        const Block& nbk = blocks[bi + 1];
        int64_t ra = pb.r + pb.l, ta = pb.t + pb.l;
        if (nbk.r - ra <= p.max_link_len && nbk.t - ta <= p.max_link_len
            && ta >= lo_b && nbk.t <= hi_b) {
            const int64_t lt0 = prof_fine ? now_ns() : 0;
            if (rsv) {
                if (!link_fast(oriented + ra, nbk.r - ra, text + ta,
                               nbk.t - ta, ra, p, links[bi]))
                    link_from_resolver(ra, nbk.r - ra, nbk.t - ta, p,
                                       rsv, links[bi]);
            } else {
                align_link(oriented + ra, nbk.r - ra, text + ta,
                           nbk.t - ta, ra, p, sc, links[bi]);
            }
            if (prof_fine) g_lr_link_ns += now_ns() - lt0;
        } else {
            hap = hap_of(hap_starts, n_haps, nbk.t);
            lo_b = hap_starts[hap];
            hi_b = hap_starts[hap + 1];
        }
    }
    int64_t best_score = INT64_MIN;
    int64_t seg_start = 0;
    for (int64_t seg_end = 0; seg_end < nb; seg_end++) {
        bool last = seg_end + 1 >= nb || !links[seg_end].ok;
        if (!last) continue;
        const Block& fb = blocks[seg_start];
        int64_t shap = hap_of(hap_starts, n_haps, fb.t);
        int64_t slo = hap_starts[shap], shi = hap_starts[shap + 1];
        TailRes lt;
        const int64_t tt0 = prof_fine ? now_ns() : 0;
        left_tail(oriented, fb.r, text, fb.t, slo, p, sc, lt);
        if (prof_fine) g_lr_tail_ns += now_ns() - tt0;
        int64_t score = 0, matches = 0;
        RunVec rv;
        int64_t read_start, t0_abs;
        if (lt.ok) {
            score += lt.score;
            matches += lt.matches;
            for (auto& r : lt.runs) rv.add(r.op, r.len, r.rpos);
            read_start = lt.read_lo;
            t0_abs = lt.text_lo;
        } else {
            read_start = fb.r;
            t0_abs = fb.t;
        }
        int64_t cur_r = fb.r, cur_t = fb.t;
        for (int64_t bi = seg_start; bi <= seg_end; bi++) {
            if (bi > seg_start) {
                LinkRes& lk = links[bi - 1];
                score += lk.score;
                matches += lk.matches;
                for (auto& r : lk.runs) rv.add(r.op, r.len, r.rpos);
            }
            rv.add(0, blocks[bi].l, blocks[bi].r);
            matches += blocks[bi].l;
            score += blocks[bi].l * p.match;
            cur_r = blocks[bi].r + blocks[bi].l;
            cur_t = blocks[bi].t + blocks[bi].l;
        }
        TailRes rt;
        const int64_t tt1 = prof_fine ? now_ns() : 0;
        right_tail(oriented, L, cur_r, text, cur_t, shi, p, sc, rt);
        if (prof_fine) g_lr_tail_ns += now_ns() - tt1;
        int64_t read_end, t1_abs;
        if (rt.ok) {
            score += rt.score;
            matches += rt.matches;
            for (auto& r : rt.runs) rv.add(r.op, r.len, r.rpos);
            read_end = rt.read_hi;
            t1_abs = rt.text_hi;
        } else {
            read_end = cur_r;
            t1_abs = cur_t;
        }
        if (read_start == 0) score += p.bonus;
        if (read_end == L) score += p.bonus;
        if (score > best_score) {
            best_score = score;
            out.runs = std::move(rv.v);
            out.matches = matches;
            out.read_start = read_start;
            out.read_end = read_end;
            out.t0 = t0_abs;
            out.t1 = t1_abs;
        }
        seg_start = seg_end + 1;
    }
    if (best_score > INT64_MIN) {
        out.ok = true;
        out.score = best_score;
    }
}

}  // namespace lrstitch

extern "C" {


// anchors -> chain DP -> kept chains, exported flat (pass 1 of the
// device link offload). Returns 0, or -1 when a cap overflowed (caller
// doubles both caps and retries).
int64_t longread_chains_batch(
    int64_t n_reads, const int64_t* read_off, const uint8_t* codes_blob,
    const uint64_t* idx_keys, const int64_t* idx_offsets, int64_t n_keys,
    const int64_t* pos_text, const uint8_t* pos_rev,
    int32_t k, int32_t w,
    int32_t hard_hit_cap, int32_t max_seeds_per_window,
    int32_t downsample_window,
    int32_t lookback_cands, int64_t max_lookback, int64_t max_indel,
    double gap_scale, double chain_gap_open, double min_chain_score,
    int32_t max_chains, double chain_frac,
    const int64_t* key_bucket_off, int32_t key_shift,
    int32_t* chain_read, uint8_t* chain_rev, int64_t chains_cap,
    int64_t* anc_off, int64_t* out_roffs, int64_t* out_tposs,
    int64_t anchors_cap, int64_t* n_chains_out, int64_t* n_anchors_out) {
    using namespace lrstitch;
    std::vector<std::vector<CRec>> per_read(n_reads);
    int fork_token = 0;
    VGTPU_HB_RELEASE(&fork_token);
#pragma omp parallel
    {
        VGTPU_HB_ACQUIRE(&fork_token);
        std::vector<int64_t> offs;
        std::vector<uint64_t> keys;
        std::vector<uint8_t> crev;
#pragma omp for schedule(dynamic)
        for (int64_t ri = 0; ri < n_reads; ri++) {
            const uint8_t* codes = codes_blob + read_off[ri];
            const int64_t L = read_off[ri + 1] - read_off[ri];
            chains_for_read(codes, L, idx_keys, idx_offsets, n_keys,
                            pos_text, pos_rev, k, w, hard_hit_cap,
                            max_seeds_per_window, downsample_window,
                            lookback_cands, max_lookback, max_indel,
                            gap_scale, chain_gap_open, min_chain_score,
                            max_chains, chain_frac, key_bucket_off,
                            key_shift, offs, keys, crev, per_read[ri],
                            nullptr);
            VGTPU_HB_RELEASE(&per_read[ri]);
        }
    }
    int64_t ci = 0, ai = 0;
    for (int64_t ri = 0; ri < n_reads; ri++) {
        VGTPU_HB_ACQUIRE(&per_read[ri]);
        for (auto& c : per_read[ri]) {
            if (ci >= chains_cap) return -1;
            if (ai + (int64_t)c.ro.size() > anchors_cap) return -1;
            chain_read[ci] = (int32_t)ri;
            chain_rev[ci] = c.rev;
            anc_off[ci] = ai;
            for (size_t q = 0; q < c.ro.size(); q++) {
                out_roffs[ai] = c.ro[q];
                out_tposs[ai] = c.tp[q];
                ai++;
            }
            ci++;
        }
    }
    anc_off[ci] = ai;
    *n_chains_out = ci;
    *n_anchors_out = ai;
    return 0;
}

// chains -> slow-link task list (the links link_fast cannot resolve),
// in the exact traversal order stitch_chain consumes them. Tasks are
// (ra, la, ta_global, lb) per chain; returns 0 or -1 on cap overflow.
int64_t longread_collect_links(
    const int64_t* read_off, const uint8_t* codes_blob,
    int64_t n_chains, const int32_t* chain_read, const uint8_t* chain_rev,
    const int64_t* anc_off, const int64_t* roffs, const int64_t* tposs,
    int32_t k,
    const uint8_t* text, const int64_t* hap_starts, int64_t n_haps,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_extend,
    int32_t bonus, int64_t max_link_len, int64_t max_tail,
    int32_t tail_band, int32_t x_drop,
    double lm_base, double lm_per_base, double lm_cap,
    double lg_base, double lg_per_base, double lg_cap,
    int64_t max_cells,
    int64_t* chain_task_off, int64_t* tasks, int64_t tasks_cap,
    int64_t* n_tasks_out) {
    using namespace lrstitch;
    Params p{match, mismatch, gap_open, gap_extend, bonus, k, tail_band,
             x_drop, max_link_len, max_tail, max_cells,
             lm_base, lm_per_base, lm_cap, lg_base, lg_per_base, lg_cap};
    std::vector<std::vector<std::array<int64_t, 4>>> per_chain(n_chains);
    int fork_token = 0;
    VGTPU_HB_RELEASE(&fork_token);
#pragma omp parallel
    {
        VGTPU_HB_ACQUIRE(&fork_token);
        std::vector<uint8_t> rcbuf;
        LinkRes tmp;
#pragma omp for schedule(dynamic)
        for (int64_t ci = 0; ci < n_chains; ci++) {
            int64_t ri = chain_read[ci];
            const uint8_t* fwd = codes_blob + read_off[ri];
            int64_t L = read_off[ri + 1] - read_off[ri];
            const uint8_t* oriented = fwd;
            if (chain_rev[ci]) {
                rcbuf.resize(L);
                for (int64_t q = 0; q < L; q++) {
                    uint8_t c = fwd[L - 1 - q];
                    rcbuf[q] = c < 4 ? 3 - c : c;
                }
                oriented = rcbuf.data();
            }
            int64_t a0 = anc_off[ci], a1 = anc_off[ci + 1];
            if (a1 <= a0) { VGTPU_HB_RELEASE(&per_chain[ci]); continue; }
            std::vector<Block> blocks;
            build_blocks(roffs + a0, tposs + a0, a1 - a0, p.k, blocks);
            int64_t nb = (int64_t)blocks.size();
            // identical geometry walk to stitch_chain's link loop
            int64_t hap = hap_of(hap_starts, n_haps, blocks[0].t);
            int64_t lo_b = hap_starts[hap], hi_b = hap_starts[hap + 1];
            for (int64_t bi = 0; bi + 1 < nb; bi++) {
                const Block& pb = blocks[bi];
                const Block& nbk = blocks[bi + 1];
                int64_t ra = pb.r + pb.l, ta = pb.t + pb.l;
                if (nbk.r - ra <= p.max_link_len
                    && nbk.t - ta <= p.max_link_len
                    && ta >= lo_b && nbk.t <= hi_b) {
                    if (!link_fast(oriented + ra, nbk.r - ra, text + ta,
                                   nbk.t - ta, ra, p, tmp))
                        per_chain[ci].push_back(
                            {ra, nbk.r - ra, ta, nbk.t - ta});
                } else {
                    hap = hap_of(hap_starts, n_haps, nbk.t);
                    lo_b = hap_starts[hap];
                    hi_b = hap_starts[hap + 1];
                }
            }
            VGTPU_HB_RELEASE(&per_chain[ci]);
        }
    }
    int64_t ti = 0;
    for (int64_t ci = 0; ci < n_chains; ci++) {
        VGTPU_HB_ACQUIRE(&per_chain[ci]);
        chain_task_off[ci] = ti;
        for (auto& t : per_chain[ci]) {
            if (ti >= tasks_cap) return -1;
            tasks[ti * 4] = t[0];
            tasks[ti * 4 + 1] = t[1];
            tasks[ti * 4 + 2] = t[2];
            tasks[ti * 4 + 3] = t[3];
            ti++;
        }
    }
    chain_task_off[n_chains] = ti;
    *n_tasks_out = ti;
    return 0;
}

// Returns 0, or -1 when the runs buffer overflowed (caller doubles).
int64_t longread_stitch_batch(
    int64_t n_reads, const int64_t* read_off, const uint8_t* codes_blob,
    int64_t n_chains, const int32_t* chain_read, const uint8_t* chain_rev,
    const int64_t* anc_off, const int64_t* roffs, const int64_t* tposs,
    int32_t k,
    const uint8_t* text, int64_t text_len,
    const int64_t* hap_starts, int64_t n_haps,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_extend,
    int32_t bonus, int64_t max_link_len, int64_t max_tail,
    int32_t tail_band, int32_t x_drop,
    double lm_base, double lm_per_base, double lm_cap,
    double lg_base, double lg_per_base, double lg_cap,
    int64_t max_cells,
    // OPTIONAL resolved slow links (device DP offload): per-chain task
    // ranges via chain_task_off; null rsv_scores = solve links here
    const int64_t* rsv_scores, const uint8_t* rsv_ok,
    const int32_t* rsv_runs, const int64_t* rsv_runs_off,
    const int64_t* chain_task_off,
    int32_t* out_score, int64_t* out_matches,
    int64_t* out_read_start, int64_t* out_read_end,
    int64_t* out_t0, int64_t* out_t1, uint8_t* out_ok,
    int32_t* runs, int64_t runs_cap, int64_t* runs_off) {
    using namespace lrstitch;
    Params p{match, mismatch, gap_open, gap_extend, bonus, k, tail_band,
             x_drop, max_link_len, max_tail, max_cells,
             lm_base, lm_per_base, lm_cap, lg_base, lg_per_base, lg_cap};

    // per-chain best-segment runs, assembled in parallel then laid out
    std::vector<std::vector<Run>> chain_runs(n_chains);
    std::vector<int8_t> chain_ok(n_chains, 0);

    int fork_token = 0;
    VGTPU_HB_RELEASE(&fork_token);
#pragma omp parallel
    {
        VGTPU_HB_ACQUIRE(&fork_token);
        Scratch sc;
        std::vector<uint8_t> rcbuf;
#pragma omp for schedule(dynamic)
        for (int64_t ci = 0; ci < n_chains; ci++) {
            int64_t ri = chain_read[ci];
            const uint8_t* fwd = codes_blob + read_off[ri];
            int64_t L = read_off[ri + 1] - read_off[ri];
            const uint8_t* oriented = fwd;
            if (chain_rev[ci]) {
                rcbuf.resize(L);
                for (int64_t q = 0; q < L; q++) {
                    uint8_t c = fwd[L - 1 - q];
                    rcbuf[q] = c < 4 ? 3 - c : c;
                }
                oriented = rcbuf.data();
            }
            int64_t a0 = anc_off[ci], a1 = anc_off[ci + 1];
            if (a1 <= a0) continue;
            ChainResult cr;
            LinkResolver rsv{rsv_scores, rsv_ok, rsv_runs, rsv_runs_off,
                             chain_task_off ? chain_task_off[ci] : 0};
            stitch_chain(oriented, L, roffs + a0, tposs + a0, a1 - a0,
                         text, hap_starts, n_haps, p, sc, cr,
                         rsv_scores ? &rsv : nullptr);
            if (cr.ok) {
                chain_ok[ci] = 1;
                out_score[ci] = (int32_t)cr.score;
                out_matches[ci] = cr.matches;
                out_read_start[ci] = cr.read_start;
                out_read_end[ci] = cr.read_end;
                out_t0[ci] = cr.t0;
                out_t1[ci] = cr.t1;
                chain_runs[ci] = std::move(cr.runs);
            }
            VGTPU_HB_RELEASE(&chain_runs[ci]);
        }
    }
    // serial layout of runs
    int64_t pos = 0;
    for (int64_t ci = 0; ci < n_chains; ci++) {
        VGTPU_HB_ACQUIRE(&chain_runs[ci]);
        runs_off[ci] = pos;
        out_ok[ci] = chain_ok[ci];
        if (!chain_ok[ci]) continue;
        if (pos + (int64_t)chain_runs[ci].size() > runs_cap) return -1;
        for (auto& r : chain_runs[ci]) {
            runs[pos * 3] = r.op;
            runs[pos * 3 + 1] = (int32_t)r.len;
            runs[pos * 3 + 2] = (int32_t)r.rpos;
            pos++;
        }
    }
    runs_off[n_chains] = pos;
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Run-based GAM encoder: like emit_gapless_gam but edits come as merged
// (op, len, oriented_read_pos) runs (op 0=M 1=X 2=I 3=D), so indel-bearing
// winners (long reads, short-read wide-band retries) encode natively too.
// Soft clips are synthesized from read_start/read_end. Reverse-strand
// paths are built in forward text space then flipped (vg
// reverse_complement_path semantics, src/path.cpp) — edit sequences come
// straight out of the original-strand ASCII read because the flipped
// slice of the oriented read IS an original-strand substring.

namespace runsgam {

struct ERec { int64_t from_len, to_len, rpos; bool has_seq; };
struct MRec {
    int64_t handle, off, nlen;
    std::vector<ERec> edits;
};

}  // namespace runsgam

extern "C" {

int64_t emit_runs_gam(
    int64_t N,
    const int64_t* t0s, const uint8_t* revs,
    const int32_t* mapqs, const int32_t* scores, const int64_t* matches,
    const int64_t* read_starts, const int64_t* read_ends,
    const int64_t* name_off, const uint8_t* names,
    const int64_t* read_off, const uint8_t* reads,
    const int64_t* qual_off, const uint8_t* quals,
    const int32_t* runs, const int64_t* runs_off,
    const int64_t* step_text_pos, const int64_t* steps, int64_t n_steps,
    const int64_t* node_id, const int64_t* seq_start,
    const int32_t* ref_path, const int64_t* ref_off, const uint8_t* ref_rev,
    const int64_t* refname_off, const uint8_t* refnames,
    uint8_t* out, int64_t out_cap, int64_t* rec_off) {
    using namespace runsgam;
    int64_t pos = 0;
    std::vector<MRec> maps;
    std::vector<uint8_t> mapbuf, pathbuf, tmp;
    for (int64_t i = 0; i < N; i++) {
        rec_off[i] = pos;
        const int64_t L = read_off[i + 1] - read_off[i];
        const int64_t t0 = t0s[i];
        const bool rev = revs[i];
        const uint8_t* rd = reads + read_off[i];
        const int64_t r_lo = read_starts[i], r_hi = read_ends[i];

        // ---- build forward-space mappings
        maps.clear();
        int64_t lo = 0, hi = n_steps;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (step_text_pos[mid + 1] > t0) hi = mid; else lo = mid + 1;
        }
        int64_t si = lo, piece_left = 0, cur_t = t0;
        auto ensure_mapping = [&]() {
            if (piece_left == 0) {
                while (step_text_pos[si + 1] <= cur_t) si++;
                int64_t h = steps[si];
                int64_t nlen = seq_start[(h >> 1) + 1] - seq_start[h >> 1];
                maps.push_back({h, cur_t - step_text_pos[si], nlen, {}});
                piece_left = step_text_pos[si + 1] - cur_t;
            }
        };
        ensure_mapping();
        if (r_lo > 0)   // leading soft clip on the first mapping
            maps.back().edits.push_back({0, r_lo, 0, true});
        const int64_t rn0 = runs_off[i], rn1 = runs_off[i + 1];
        for (int64_t r = rn0; r < rn1; r++) {
            int32_t op = runs[r * 3];
            int64_t len = runs[r * 3 + 1];
            int64_t rp = runs[r * 3 + 2];
            if (op == 2) {  // insertion: attach to current mapping
                maps.back().edits.push_back({0, len, rp, true});
                continue;
            }
            // text-consuming runs split at node boundaries
            int64_t left = len;
            while (left > 0) {
                ensure_mapping();
                int64_t take = std::min(left, piece_left);
                if (op == 0)
                    maps.back().edits.push_back({take, take, rp, false});
                else if (op == 1)
                    maps.back().edits.push_back({take, take, rp, true});
                else
                    maps.back().edits.push_back({take, 0, rp, false});
                piece_left -= take;
                cur_t += take;
                left -= take;
                if (op != 3) rp += take;
            }
        }
        if (r_hi < L)   // trailing soft clip on the last mapping
            maps.back().edits.push_back({0, L - r_hi, r_hi, true});

        // ---- merge adjacent same-kind M edits within each mapping
        for (auto& m : maps) {
            size_t w = 0;
            for (size_t e = 0; e < m.edits.size(); e++) {
                ERec& cur = m.edits[e];
                if (w > 0) {
                    ERec& prv = m.edits[w - 1];
                    bool both_m = !prv.has_seq && !cur.has_seq
                        && prv.from_len == prv.to_len
                        && cur.from_len == cur.to_len;
                    if (both_m) {
                        prv.from_len += cur.from_len;
                        prv.to_len += cur.to_len;
                        continue;
                    }
                }
                m.edits[w++] = cur;
            }
            m.edits.resize(w);
        }

        // ---- serialize (flip on the fly when rev)
        pathbuf.clear();
        const int64_t n_maps = (int64_t)maps.size();
        for (int64_t mi = 0; mi < n_maps; mi++) {
            const MRec& m = maps[rev ? n_maps - 1 - mi : mi];
            int64_t from_total = 0;
            for (const auto& e : m.edits) from_total += e.from_len;
            int64_t h = m.handle;
            bool mrev = (h & 1) != 0;
            int64_t off = m.off;
            if (rev) { mrev = !mrev; off = m.nlen - off - from_total; }
            mapbuf.clear();
            tmp.clear();
            tmp.resize(64);
            int64_t tp = 0;
            tp = put_tag(tmp.data(), tp, 1, 0);
            tp = put_varint(tmp.data(), tp, (uint64_t)node_id[h >> 1]);
            if (off) {
                tp = put_tag(tmp.data(), tp, 2, 0);
                tp = put_varint(tmp.data(), tp, (uint64_t)off);
            }
            if (mrev) {
                tp = put_tag(tmp.data(), tp, 4, 0);
                tmp[tp++] = 1;
            }
            mapbuf.push_back((1 << 3) | 2);
            {
                uint8_t vb[10];
                int64_t vp = put_varint(vb, 0, (uint64_t)tp);
                mapbuf.insert(mapbuf.end(), vb, vb + vp);
            }
            mapbuf.insert(mapbuf.end(), tmp.data(), tmp.data() + tp);
            const int64_t ne = (int64_t)m.edits.size();
            for (int64_t ei = 0; ei < ne; ei++) {
                const ERec& e = m.edits[rev ? ne - 1 - ei : ei];
                tmp.clear();
                tmp.resize(40 + (e.has_seq ? e.to_len : 0));
                int64_t ep = 0;
                if (e.from_len) {
                    ep = put_tag(tmp.data(), ep, 1, 0);
                    ep = put_varint(tmp.data(), ep, (uint64_t)e.from_len);
                }
                if (e.to_len) {
                    ep = put_tag(tmp.data(), ep, 2, 0);
                    ep = put_varint(tmp.data(), ep, (uint64_t)e.to_len);
                }
                if (e.has_seq && e.to_len) {
                    ep = put_tag(tmp.data(), ep, 3, 2);
                    ep = put_varint(tmp.data(), ep, (uint64_t)e.to_len);
                    // oriented slice [rpos, rpos+to_len) = original-strand
                    // slice (mirrored when rev)
                    int64_t o0 = rev ? (L - e.rpos - e.to_len) : e.rpos;
                    for (int64_t q = 0; q < e.to_len; q++)
                        tmp[ep++] = rd[o0 + q];
                }
                mapbuf.push_back((2 << 3) | 2);
                {
                    uint8_t vb[10];
                    int64_t vp = put_varint(vb, 0, (uint64_t)ep);
                    mapbuf.insert(mapbuf.end(), vb, vb + vp);
                }
                mapbuf.insert(mapbuf.end(), tmp.data(), tmp.data() + ep);
            }
            {
                uint8_t vb[16];
                int64_t vp = 0;
                vp = put_tag(vb, vp, 5, 0);
                vp = put_varint(vb, vp, (uint64_t)(mi + 1));
                mapbuf.insert(mapbuf.end(), vb, vb + vp);
            }
            pathbuf.push_back((2 << 3) | 2);
            {
                uint8_t vb[10];
                int64_t vp = put_varint(vb, 0, (uint64_t)mapbuf.size());
                pathbuf.insert(pathbuf.end(), vb, vb + vp);
            }
            pathbuf.insert(pathbuf.end(), mapbuf.begin(), mapbuf.end());
        }

        // ---- assemble Alignment (same field layout as emit_gapless_gam)
        const int64_t name_len = name_off[i + 1] - name_off[i];
        tmp.clear();
        if (ref_path[i] >= 0) {
            const int64_t f0 = refname_off[ref_path[i]];
            const int64_t f1 = refname_off[ref_path[i] + 1];
            tmp.resize(32 + (f1 - f0));
            int64_t rp = 0;
            if (ref_off[i]) {
                rp = put_tag(tmp.data(), rp, 2, 0);
                rp = put_varint(tmp.data(), rp, (uint64_t)ref_off[i]);
            }
            if (ref_rev[i]) {
                rp = put_tag(tmp.data(), rp, 4, 0);
                tmp[rp++] = 1;
            }
            rp = put_tag(tmp.data(), rp, 5, 2);
            rp = put_varint(tmp.data(), rp, (uint64_t)(f1 - f0));
            for (int64_t q = f0; q < f1; q++) tmp[rp++] = refnames[q];
            tmp.resize(rp);
        }
        const int64_t qual_len = qual_off[i + 1] - qual_off[i];
        int64_t need = 1 + varint_size(L) + L
                     + (qual_len ? 12 + qual_len : 0)
                     + 1 + varint_size(pathbuf.size()) + pathbuf.size()
                     + 1 + varint_size(name_len) + name_len
                     + 12 + 12
                     + (tmp.empty() ? 0
                        : (2 + varint_size(tmp.size()) + (int64_t)tmp.size()))
                     + 10;
        if (pos + need + 16 > out_cap) return -1;
        pos = put_tag(out, pos, 1, 2);
        pos = put_varint(out, pos, (uint64_t)L);
        memcpy(out + pos, rd, L);
        pos += L;
        pos = put_tag(out, pos, 2, 2);
        pos = put_varint(out, pos, (uint64_t)pathbuf.size());
        memcpy(out + pos, pathbuf.data(), pathbuf.size());
        pos += pathbuf.size();
        if (name_len) {
            pos = put_tag(out, pos, 3, 2);
            pos = put_varint(out, pos, (uint64_t)name_len);
            memcpy(out + pos, names + name_off[i], name_len);
            pos += name_len;
        }
        if (qual_len) {
            pos = put_tag(out, pos, 4, 2);
            pos = put_varint(out, pos, (uint64_t)qual_len);
            memcpy(out + pos, quals + qual_off[i], qual_len);
            pos += qual_len;
        }
        if (mapqs[i]) {
            pos = put_tag(out, pos, 5, 0);
            pos = put_varint(out, pos, (uint64_t)mapqs[i]);
        }
        if (scores[i]) {
            pos = put_tag(out, pos, 6, 0);
            pos = put_varint(out, pos, (uint64_t)scores[i]);
        }
        {
            double ident = L ? (double)matches[i] / (double)L : 0.0;
            pos = put_tag(out, pos, 16, 1);
            memcpy(out + pos, &ident, 8);
            pos += 8;
        }
        if (!tmp.empty()) {
            pos = put_tag(out, pos, 19, 2);
            pos = put_varint(out, pos, (uint64_t)tmp.size());
            memcpy(out + pos, tmp.data(), tmp.size());
            pos += (int64_t)tmp.size();
        }
        rec_off[i + 1] = pos;
    }
    rec_off[N] = pos;
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused long-read mapping: minimizer anchors -> chain DP -> greedy chain
// extraction -> stitch, all in one OpenMP pass over reads (the per-read
// numpy call overhead of anchors/chains capped throughput at ~350/s).
// Semantics mirror map/longread.py _anchors/_read_chains exactly.

extern "C" {

void lr_prof(int64_t* out) {
    out[0] = g_lr_anchor_ns.load();
    out[1] = g_lr_chain_ns.load();
    out[2] = g_lr_stitch_ns.load();
    out[3] = g_lr_link_ns.load();
    out[4] = g_lr_link_cells.load();
    out[5] = g_lr_link_calls.load();
    out[6] = g_lr_tail_ns.load();
}

int64_t longread_map_batch(
    int64_t n_reads, const int64_t* read_off, const uint8_t* codes_blob,
    // minimizer index (sorted unique keys + hit ranges)
    const uint64_t* idx_keys, const int64_t* idx_offsets, int64_t n_keys,
    const int64_t* pos_text, const uint8_t* pos_rev,
    int32_t k, int32_t w,
    // anchor params
    int32_t hard_hit_cap, int32_t max_seeds_per_window,
    int32_t downsample_window,
    // chain params
    int32_t lookback_cands, int64_t max_lookback, int64_t max_indel,
    double gap_scale, double chain_gap_open, double min_chain_score,
    int32_t max_chains, double chain_frac,
    // text / stitch params
    const uint8_t* text, int64_t text_len,
    const int64_t* hap_starts, int64_t n_haps,
    int32_t match, int32_t mismatch, int32_t gap_open, int32_t gap_extend,
    int32_t bonus, int64_t max_link_len, int64_t max_tail,
    int32_t tail_band, int32_t x_drop,
    double lm_base, double lm_per_base, double lm_cap,
    double lg_base, double lg_per_base, double lg_cap,
    int64_t max_cells,
    // key-lookup bucket accelerator (optional, may be null) — same
    // contract as seed_batch's key_bucket_off
    const int64_t* key_bucket_off, int32_t key_shift,
    // outputs: up to max_chains records per read, laid out at
    // read_i * max_chains + slot; n_out[read] = used slots
    int32_t* n_out, uint8_t* out_rev, int32_t* out_score,
    int64_t* out_matches, int64_t* out_read_start, int64_t* out_read_end,
    int64_t* out_t0, int64_t* out_t1,
    int32_t* runs, int64_t runs_cap, int64_t* runs_off) {
    using namespace lrstitch;
    Params p{match, mismatch, gap_open, gap_extend, bonus, k, tail_band,
             x_drop, max_link_len, max_tail, max_cells,
             lm_base, lm_per_base, lm_cap, lg_base, lg_per_base, lg_cap};
    const int64_t max_slots = (int64_t)max_chains;
    std::vector<std::vector<Run>> slot_runs(n_reads * max_slots);

    int fork_token = 0;
    VGTPU_HB_RELEASE(&fork_token);
#pragma omp parallel
    {
        VGTPU_HB_ACQUIRE(&fork_token);
        Scratch sc;
        std::vector<int64_t> offs;
        std::vector<uint64_t> keys;
        std::vector<uint8_t> crev;
        std::vector<uint8_t> rcbuf;
        const bool prof = std::getenv("VGTPU_LR_PROF") != nullptr;
        int64_t t_anchor = 0, t_chain = 0, t_stitch = 0;
#pragma omp for schedule(dynamic)
        for (int64_t ri = 0; ri < n_reads; ri++) {
            const int64_t tp0 = prof ? now_ns() : 0;
            n_out[ri] = 0;
            const uint8_t* codes = codes_blob + read_off[ri];
            const int64_t L = read_off[ri + 1] - read_off[ri];
            if (L < k) { for (int64_t s2 = 0; s2 < max_slots; s2++) VGTPU_HB_RELEASE(&slot_runs[ri * max_slots + s2]); continue; }
            std::vector<CRec> chains;
            int64_t t_anchor_ns = 0;
            chains_for_read(codes, L, idx_keys, idx_offsets, n_keys,
                            pos_text, pos_rev, k, w, hard_hit_cap,
                            max_seeds_per_window, downsample_window,
                            lookback_cands, max_lookback, max_indel,
                            gap_scale, chain_gap_open, min_chain_score,
                            max_chains, chain_frac, key_bucket_off,
                            key_shift, offs, keys, crev, chains,
                            prof ? &t_anchor_ns : nullptr);
            if (prof && t_anchor_ns)
                t_anchor += t_anchor_ns - tp0;
            if (chains.empty()) { for (int64_t s2 = 0; s2 < max_slots; s2++) VGTPU_HB_RELEASE(&slot_runs[ri * max_slots + s2]); continue; }
            const int64_t tp2 = prof ? now_ns() : 0;
            if (prof && t_anchor_ns) t_chain += tp2 - t_anchor_ns;
            // stitch each chain
            int32_t slot = 0;
            for (auto& c : chains) {
                const uint8_t* oriented = codes;
                if (c.rev) {
                    rcbuf.resize(L);
                    for (int64_t q = 0; q < L; q++) {
                        uint8_t cc = codes[L - 1 - q];
                        rcbuf[q] = cc < 4 ? 3 - cc : cc;
                    }
                    oriented = rcbuf.data();
                }
                ChainResult cr;
                stitch_chain(oriented, L, c.ro.data(), c.tp.data(),
                             (int64_t)c.ro.size(), text, hap_starts,
                             n_haps, p, sc, cr);
                if (!cr.ok) continue;
                int64_t slot_i = ri * max_slots + slot;
                out_rev[slot_i] = c.rev;
                out_score[slot_i] = (int32_t)cr.score;
                out_matches[slot_i] = cr.matches;
                out_read_start[slot_i] = cr.read_start;
                out_read_end[slot_i] = cr.read_end;
                out_t0[slot_i] = cr.t0;
                out_t1[slot_i] = cr.t1;
                slot_runs[slot_i] = std::move(cr.runs);
                slot++;
            }
            n_out[ri] = slot;
            if (prof) t_stitch += now_ns() - tp2;
            for (int64_t s2 = 0; s2 < max_slots; s2++)
                VGTPU_HB_RELEASE(&slot_runs[ri * max_slots + s2]);
        }
        if (prof) {
            g_lr_anchor_ns += t_anchor;
            g_lr_chain_ns += t_chain;
            g_lr_stitch_ns += t_stitch;
        }
    }
    // serial layout of runs (slot-major)
    int64_t pos = 0;
    int64_t total_slots = n_reads * max_slots;
    for (int64_t si = 0; si < total_slots; si++) {
        VGTPU_HB_ACQUIRE(&slot_runs[si]);
        runs_off[si] = pos;
        for (auto& r : slot_runs[si]) {
            if (pos >= runs_cap) return -1;
            runs[pos * 3] = r.op;
            runs[pos * 3 + 1] = (int32_t)r.len;
            runs[pos * 3 + 2] = (int32_t)r.rpos;
            pos++;
        }
    }
    runs_off[total_slots] = pos;
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// dag_align: base-level POA of a read against a flattened DAG (the gssw /
// GSSWAligner role, reference src/aligner.cpp:30-300). Exact port of the
// numpy _align_dag/_traceback in ops/graph_align.py: affine gaps, per-cell
// backpointers, local (free clips + full-length bonuses) or global mode.
// Emits the per-base traceback step list; Python groups steps into Mappings.
// ---------------------------------------------------------------------------
extern "C" {

int64_t dag_align(
    const uint8_t* codes, int64_t V,
    const int64_t* pred_off, const int32_t* preds,
    const uint8_t* is_sink,
    const uint8_t* read, int64_t L,
    int32_t m, int32_t x, int32_t go, int32_t ge, int32_t fb_in,
    int32_t local_i,
    // outputs: steps in EMIT (reverse-traceback) order
    int32_t* sv, int32_t* sf, int32_t* st, int32_t* slo, int32_t* shi,
    int64_t steps_cap, int64_t* n_steps,
    int64_t* out_matches, int32_t* out_best_v, int32_t* out_best_i) {
    const int32_t NEG = -100000000;
    const bool local = local_i != 0;
    const int32_t fb = local ? fb_in : 0;
    if (V == 0 || L == 0) return NEG;
    const int64_t W = L + 1;

    std::vector<int32_t> H((size_t)V * W), E((size_t)V * W);
    std::vector<uint8_t> hmove((size_t)V * W);
    std::vector<int32_t> hpred((size_t)V * W), epred((size_t)V * W);
    std::vector<uint8_t> eopen((size_t)V * W), fopen((size_t)V * W);

    std::vector<int32_t> Hb(W), Eb(W, NEG);
    if (local) {
        std::fill(Hb.begin(), Hb.end(), NEG);
        Hb[0] = fb;
    } else {
        Hb[0] = 0;
        for (int64_t i = 1; i < W; i++) Hb[i] = -(go + ge * (int32_t)(i - 1));
    }

    int32_t best_s = local ? 0 : NEG;
    int32_t best_v = -1, best_i = 0;
    std::vector<int32_t> Hp(W), Ep(W), HpSrc(W), EpSrc(W);
    std::vector<int32_t> diag(W), Ev(W), Hn(W), Fv(W), Hv(W);

    for (int64_t v = 0; v < V; v++) {
        const int64_t p0 = pred_off[v], p1 = pred_off[v + 1];
        if (p1 > p0) {
            const int32_t f = preds[p0];
            const int32_t* Hf = &H[(size_t)f * W];
            const int32_t* Ef = &E[(size_t)f * W];
            for (int64_t i = 0; i < W; i++) {
                Hp[i] = Hf[i]; HpSrc[i] = f;
                Ep[i] = Ef[i]; EpSrc[i] = f;
            }
            for (int64_t pk = p0 + 1; pk < p1; pk++) {
                const int32_t p = preds[pk];
                const int32_t* Hq = &H[(size_t)p * W];
                const int32_t* Eq = &E[(size_t)p * W];
                for (int64_t i = 0; i < W; i++) {
                    if (Hq[i] > Hp[i]) { Hp[i] = Hq[i]; HpSrc[i] = p; }
                    if (Eq[i] > Ep[i]) { Ep[i] = Eq[i]; EpSrc[i] = p; }
                }
            }
        } else {
            for (int64_t i = 0; i < W; i++) {
                Hp[i] = Hb[i]; HpSrc[i] = -1;
                Ep[i] = Eb[i]; EpSrc[i] = -1;
            }
        }
        const uint8_t cb = codes[v];
        diag[0] = NEG;
        for (int64_t i = 1; i < W; i++) {
            const uint8_t rb = read[i - 1];
            const int32_t sub = (rb == cb && rb < 4) ? m : -x;
            diag[i] = Hp[i - 1] + sub;
        }
        uint8_t* eo = &eopen[(size_t)v * W];
        int32_t* ep = &epred[(size_t)v * W];
        int32_t* Erow = &E[(size_t)v * W];
        for (int64_t i = 0; i < W; i++) {
            const int32_t eo_s = Hp[i] - go, ee_s = Ep[i] - ge;
            const bool opn = eo_s >= ee_s;
            Ev[i] = opn ? eo_s : ee_s;
            eo[i] = opn ? 1 : 0;
            ep[i] = opn ? HpSrc[i] : EpSrc[i];
            Erow[i] = Ev[i];
        }
        uint8_t* mv = &hmove[(size_t)v * W];
        for (int64_t i = 0; i < W; i++) {
            Hn[i] = diag[i] >= Ev[i] ? diag[i] : Ev[i];
            mv[i] = diag[i] >= Ev[i] ? 0 : 1;
        }
        if (local) {
            for (int64_t i = 0; i < W; i++) {
                const int32_t floor_i = (i == 0) ? fb : 0;
                if (Hn[i] < floor_i) { Hn[i] = floor_i; mv[i] = 3; }
            }
        }
        // F within the column: prefix-max trick (exact for affine)
        int32_t gmax = NEG;
        uint8_t* fo = &fopen[(size_t)v * W];
        Fv[0] = NEG;
        fo[0] = 1;
        for (int64_t i = 1; i < W; i++) {
            const int32_t gk = Hn[i - 1] + ge * (int32_t)(i - 1);
            if (gk > gmax) gmax = gk;
            Fv[i] = gmax - go - ge * (int32_t)(i - 1);
            fo[i] = (Hn[i - 1] - go) >= (Fv[i - 1] - ge) ? 1 : 0;
        }
        int32_t* Hrow = &H[(size_t)v * W];
        int32_t* hp = &hpred[(size_t)v * W];
        for (int64_t i = 0; i < W; i++) {
            Hv[i] = Fv[i] > Hn[i] ? Fv[i] : Hn[i];
            if (Fv[i] > Hn[i]) mv[i] = 2;
            Hrow[i] = Hv[i];
            hp[i] = HpSrc[i];
        }
        if (local) {
            int64_t cell = 0;
            for (int64_t i = 1; i < W; i++)
                if (Hv[i] > Hv[cell]) cell = i;   // first max (argmax)
            if (Hv[cell] > best_s) {
                best_s = Hv[cell]; best_v = (int32_t)v;
                best_i = (int32_t)cell;
            }
            const int32_t endsc = Hv[L] + fb;
            if (endsc > best_s) {
                best_s = endsc; best_v = (int32_t)v; best_i = (int32_t)L;
            }
        } else if (is_sink[v] && Hv[L] > best_s) {
            best_s = Hv[L]; best_v = (int32_t)v; best_i = (int32_t)L;
        }
    }

    *out_best_v = best_v;
    *out_best_i = best_i;
    if (best_v < 0 || (local && best_s <= 0)) return NEG;

    // ---- traceback (mirror of ops/graph_align.py _traceback)
    int64_t ns = 0;
    int64_t matches = 0;
    int32_t v = best_v;
    int64_t i = best_i;
#define DAG_STEP(vv, f_, t_, lo_, hi_) do { \
        if (ns >= steps_cap) return NEG - 1; \
        sv[ns] = (int32_t)(vv); sf[ns] = (f_); st[ns] = (t_); \
        slo[ns] = (int32_t)(lo_); shi[ns] = (int32_t)(hi_); ns++; } while (0)
    if (i < L) DAG_STEP(v, 0, (int32_t)(L - i), i, L);
    int state = 0;  // 0 H, 1 E, 2 F
    while (v >= 0) {
        if (state == 0) {
            const uint8_t mv = hmove[(size_t)v * W + i];
            if (mv == 3 || (i == 0 && local)) break;
            if (mv == 0) {
                const uint8_t rb = read[i - 1];
                if (rb == codes[v] && rb < 4) {
                    DAG_STEP(v, 1, 1, 0, 0);
                    matches++;
                } else {
                    DAG_STEP(v, 1, 1, i - 1, i);
                }
                const int32_t nv = hpred[(size_t)v * W + (i - 1)];
                i -= 1;
                v = nv;
                if (v < 0) break;
            } else if (mv == 1) {
                state = 1;
            } else {
                state = 2;
            }
        } else if (state == 1) {
            DAG_STEP(v, 1, 0, 0, 0);
            const bool opn = eopen[(size_t)v * W + i] != 0;
            const int32_t nv = epred[(size_t)v * W + i];
            v = nv;
            state = opn ? 0 : 1;
            if (v < 0) break;
        } else {
            DAG_STEP(v, 0, 1, i - 1, i);
            const bool opn = fopen[(size_t)v * W + i] != 0;
            i -= 1;
            state = opn ? 0 : 2;
        }
        if (state == 0 && i == 0 && !local) {
            if (v >= 0 && hmove[(size_t)v * W] == 3) break;
            if (v >= 0 && pred_off[v + 1] == pred_off[v]) break;
        }
    }
    if (i > 0) DAG_STEP(v >= 0 ? v : 0, 0, (int32_t)i, 0, i);
#undef DAG_STEP
    *n_steps = ns;
    *out_matches = matches;
    return best_s;
}

}  // extern "C"

extern "C" {

// Scatter-gather record assembly: span k copies src_len[k] bytes from
// srcs[src_id[k]] + src_off[k] to out + dst_off[k]. The paired emitter
// uses this to build final GAM records (record bytes + mate-name wire
// field + annotation suffix) in one call instead of per-record Python
// bytes concatenation (reference analogue: the emitter hot loop of
// src/subcommand/giraffe_main.cpp:2307-2355 is plain C++ there).
// Destination offsets are precomputed (numpy cumsum) so spans are
// independent and the copy parallelizes. Returns 0 ok, -1 if any span
// would write past out_cap or read past its source buffer
// (src_size[src_id[k]]; a malformed span table must fail, not memcpy
// arbitrary host memory into emitted records).
int64_t concat_spans(int64_t n_spans, const uint8_t* const* srcs,
                     const int64_t* src_size,
                     const uint8_t* src_id, const int64_t* src_off,
                     const int64_t* src_len, const int64_t* dst_off,
                     uint8_t* out, int64_t out_cap) {
    for (int64_t k = 0; k < n_spans; k++) {
        if (dst_off[k] + src_len[k] > out_cap) return -1;
        if (src_len[k] > 0 &&
            (src_off[k] < 0 ||
             src_off[k] + src_len[k] > src_size[src_id[k]])) return -2;
    }
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < n_spans; k++) {
        if (src_len[k] > 0)
            std::memcpy(out + dst_off[k], srcs[src_id[k]] + src_off[k],
                        (size_t)src_len[k]);
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused read encoding for the paired dispatch hot path: ASCII (one
// concatenated blob of R equal-length reads) -> base codes, reverse
// complements, and the 2-bit packed wire words in ONE OpenMP pass.
// Replaces three numpy passes (dna.encode lookup, complement+reverse,
// pack_reads2's 16-step shift loop) that together cost ~2 us/read of the
// score stage. Wire semantics match ops/xfer.pack_reads2: 2 bits per
// code little-endian within each int32 word; codes >= 4 (N) become
// exception entries row*4096 + col (row-major order, capped — the
// caller falls back to the 4-bit layout when the total exceeds the cap).
// `packed` must arrive zeroed (pad bits stay 0; the device reconstructs
// pad from rlen). Returns the TOTAL number of in-read N positions.

extern "C" {

int64_t encode_pack_reads(const uint8_t* ascii, int64_t R, int64_t L,
                          int64_t Rpad, int64_t RL, int64_t W,
                          uint8_t* codes, uint8_t* rc, int32_t* packed,
                          int32_t* exc, int64_t exc_cap) {
    if (L > RL || (RL + 15) / 16 > W || R > Rpad) return -1;
    uint8_t lut[256];
    std::memset(lut, 4, sizeof(lut));
    lut[(unsigned)'A'] = 0; lut[(unsigned)'a'] = 0;
    lut[(unsigned)'C'] = 1; lut[(unsigned)'c'] = 1;
    lut[(unsigned)'G'] = 2; lut[(unsigned)'g'] = 2;
    lut[(unsigned)'T'] = 3; lut[(unsigned)'t'] = 3;
    std::atomic<int64_t> n_exc_total{0};
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < Rpad; i++) {
        uint8_t* c = codes + i * RL;
        uint8_t* rcr = rc + i * RL;
        if (i >= R) {   // batch padding rows: all pad
            std::memset(c, 5, (size_t)RL);
            std::memset(rcr, 5, (size_t)RL);
            continue;
        }
        const uint8_t* src = ascii + i * L;
        // packed == nullptr skips the 2-bit wire (single-end dispatch
        // and 4-bit-wire mappers never consume it)
        uint32_t* p = packed ? (uint32_t*)(packed + i * W) : nullptr;
        int64_t local_exc = 0;
        if (p) {
            for (int64_t j = 0; j < L; j++) {
                const uint8_t v = lut[src[j]];
                c[j] = v;
                rcr[L - 1 - j] = v < 4 ? (uint8_t)(3 - v) : v;
                p[j >> 4] |= (uint32_t)(v & 3) << ((j & 15) * 2);
                if (v >= 4) local_exc++;
            }
        } else {
            for (int64_t j = 0; j < L; j++) {
                const uint8_t v = lut[src[j]];
                c[j] = v;
                rcr[L - 1 - j] = v < 4 ? (uint8_t)(3 - v) : v;
                if (v >= 4) local_exc++;
            }
        }
        if (local_exc) n_exc_total += local_exc;
        for (int64_t j = L; j < RL; j++) { c[j] = 5; rcr[j] = 5; }
    }
    const int64_t total = n_exc_total.load();
    if (total > 0 && exc_cap > 0) {   // rare: ordered second pass
        int64_t k = 0;
        for (int64_t i = 0; i < R && k < exc_cap; i++) {
            const uint8_t* c = codes + i * RL;
            for (int64_t j = 0; j < L && k < exc_cap; j++)
                if (c[j] >= 4) exc[k++] = (int32_t)(i * 4096 + j);
        }
    }
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// OpenMP batch of banded_traceback over independent rows: the emit
// slow path (indel/overhang winners — reads carrying novel indels
// against the haplotype text) previously paid a per-row Python DP
// roundtrip (~0.7 ms each, the dominant emit cost on novel-variant
// read sets). Row t: read row (stride Lmax, true length rlen[t]),
// window row (stride TWmax, true width rlen[t] + 2B). Outputs mirror
// banded_traceback per row.

extern "C" {

int64_t banded_traceback_batch(
    int64_t n, const uint8_t* reads, int64_t Lmax, const int64_t* rlen,
    const uint8_t* wins, int64_t TWmax, int32_t B,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend, int32_t bonus,
    int64_t* scores, int64_t* spans /* (n,4) */,
    int32_t* edits /* (n, cap, 3) */, int64_t edit_cap,
    int64_t* n_edits, int64_t* matches_out, int32_t x_drop) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t t = 0; t < n; t++) {
        const int64_t L = rlen[t];
        const int64_t TW = std::min(L + 2 * (int64_t)B, TWmax);
        scores[t] = banded_traceback(
            reads + t * Lmax, L, wins + t * TWmax, TW, B,
            match, mismatch, gap_open, gap_extend, bonus,
            spans + t * 4, edits + t * edit_cap * 3, edit_cap,
            n_edits + t, matches_out + t, x_drop);
    }
    return 0;
}

}  // extern "C"
