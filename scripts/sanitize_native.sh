#!/usr/bin/env bash
# Sanitizer harness for the native host kernels (the reference ships TSAN
# and UBSAN builds: vg Makefile sanitizer targets, vgci). The Python
# process cannot load an ASan .so without LD_PRELOAD games, so this
# drives the kernels from a standalone C++ harness built twice:
#   1. -fsanitize=address,undefined  (memory errors, UB)
#   2. -fsanitize=thread             (races in the OpenMP batch loops)
# Usage: scripts/sanitize_native.sh [asan|tsan|both]
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-both}"
SRC=vg_tpu/native/vgtpu_host.cpp
HARNESS=$(mktemp -d)/harness.cpp

cat > "$HARNESS" <<'EOF'
// Stress harness: random reads vs random text through the batched
// long-read pipeline (OpenMP over reads) and the emit kernels.
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <vector>
#include <random>
#include <algorithm>

extern "C" int64_t longread_map_batch(
    int64_t, const int64_t*, const uint8_t*,
    const uint64_t*, const int64_t*, int64_t,
    const int64_t*, const uint8_t*, int32_t, int32_t,
    int32_t, int32_t, int32_t,
    int32_t, int64_t, int64_t, double, double, double, int32_t, double,
    const uint8_t*, int64_t, const int64_t*, int64_t,
    int32_t, int32_t, int32_t, int32_t, int32_t,
    int64_t, int64_t, int32_t, int32_t,
    double, double, double, double, double, double, int64_t,
    int32_t*, uint8_t*, int32_t*, int64_t*, int64_t*, int64_t*,
    int64_t*, int64_t*, int32_t*, int64_t, int64_t*);
extern "C" int64_t extract_minimizers(const uint8_t*, int64_t, int32_t,
                                      int32_t, int64_t*, uint64_t*,
                                      uint8_t*);

int main() {
    std::mt19937_64 rng(7);
    const int64_t T = 500000;
    std::vector<uint8_t> text(T);
    for (auto& c : text) c = rng() & 3;
    // minimizer index over the text
    std::vector<int64_t> offs(T);
    std::vector<uint64_t> keys(T);
    std::vector<uint8_t> rev(T);
    int64_t nm = extract_minimizers(text.data(), T, 29, 11, offs.data(),
                                    keys.data(), rev.data());
    // sort (key, pos) and build unique-key offset table
    std::vector<int64_t> idx(nm);
    for (int64_t i = 0; i < nm; i++) idx[i] = i;
    std::sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
        return keys[a] < keys[b];
    });
    std::vector<uint64_t> ukeys;
    std::vector<int64_t> uoff, ptext;
    std::vector<uint8_t> prev;
    for (int64_t q = 0; q < nm; q++) {
        int64_t i = idx[q];
        if (ukeys.empty() || ukeys.back() != keys[i]) {
            ukeys.push_back(keys[i]);
            uoff.push_back((int64_t)ptext.size());
        }
        ptext.push_back(offs[i]);
        prev.push_back(rev[i]);
    }
    uoff.push_back((int64_t)ptext.size());
    int64_t hap_starts[2] = {0, T};
    // reads: windows of the text with mutations
    const int64_t R = 64, L = 8000;
    std::vector<uint8_t> blob(R * L);
    std::vector<int64_t> roff(R + 1);
    for (int64_t r = 0; r < R; r++) {
        roff[r] = r * L;
        int64_t s = rng() % (T - L);
        for (int64_t q = 0; q < L; q++) {
            uint8_t c = text[s + q];
            if ((rng() & 127) == 0) c = (c + 1 + rng() % 3) & 3;
            blob[r * L + q] = c;
        }
    }
    roff[R] = R * L;
    const int32_t MC = 4;
    std::vector<int32_t> n_out(R);
    std::vector<uint8_t> orev(R * MC);
    std::vector<int32_t> oscore(R * MC);
    std::vector<int64_t> omat(R * MC), ors(R * MC), ore(R * MC),
        ot0(R * MC), ot1(R * MC);
    int64_t cap = R * L;
    std::vector<int32_t> runs(cap * 3);
    std::vector<int64_t> runs_off(R * MC + 1);
    for (int rep = 0; rep < 3; rep++) {
        int64_t rc = longread_map_batch(
            R, roff.data(), blob.data(),
            ukeys.data(), uoff.data(), (int64_t)ukeys.size(),
            ptext.data(), prev.data(), 29, 11,
            500, 4, 152,
            64, 20000, 5000, 0.1, 1.0, 40.0, MC, 0.7,
            text.data(), T, hap_starts, 1,
            1, 4, 6, 1, 5,
            4000, 500, 64, 100,
            2.0, 0.05, 15.0, 33.0, 0.195722, 240.0, 4000000,
            n_out.data(), orev.data(), oscore.data(), omat.data(),
            ors.data(), ore.data(), ot0.data(), ot1.data(),
            runs.data(), cap, runs_off.data());
        if (rc != 0) { std::fprintf(stderr, "runs overflow\n"); return 1; }
        int64_t mapped = 0;
        for (int64_t r = 0; r < R; r++) mapped += n_out[r] > 0;
        std::fprintf(stderr, "rep %d: %lld/%lld mapped\n", rep,
                     (long long)mapped, (long long)R);
        if (mapped < R * 9 / 10) return 1;
    }
    std::puts("SANITIZE OK");
    return 0;
}
EOF

run_mode() {
    local flags="$1" name="$2"
    local bin
    bin=$(mktemp -d)/harness_$name
    echo "== building $name =="
    g++ -O1 -g -fopenmp -std=c++17 $flags "$SRC" "$HARNESS" -o "$bin" \
        -shared-libgcc
    echo "== running $name =="
    "$bin"
}

run_tsan() {
    local bin log
    bin=$(mktemp -d)/harness_tsan
    log=$(mktemp)
    echo "== building tsan =="
    g++ -O1 -g -fopenmp -std=c++17 -fsanitize=thread "$SRC" "$HARNESS" \
        -o "$bin" -shared-libgcc
    echo "== running tsan =="
    TSAN_OPTIONS="exitcode=0" "$bin" 2> "$log" \
        || { cat "$log"; exit 1; }
    # libgomp is not TSan-instrumented, so workers reading the
    # shared-variable frame on the MAIN THREAD'S STACK at region entry
    # are reported even though the worker->main joins are annotated
    # (__tsan_release/acquire in vgtpu_host.cpp). Those reports carry
    # "Location is stack of main thread"; main is parked in the gomp
    # barrier for the region's duration, so they cannot be real races.
    # Anything NOT on main's stack (heap, outputs) is a REAL finding.
    python3 - "$log" <<'PY'
import re, sys
text = open(sys.argv[1]).read()
blocks = re.findall(
    r"WARNING: ThreadSanitizer: data race.*?(?:={10,}|\Z)", text, re.S)
bad = [b for b in blocks if "Location is stack of main thread" not in b]
print(f"tsan: {len(blocks)} reports, "
      f"{len(blocks) - len(bad)} known libgomp fork-frame reads")
if bad:
    print("\n".join(bad[:3]))
    print("TSAN: unexplained data races")
    sys.exit(1)
PY
}

if [[ "$MODE" == "asan" || "$MODE" == "both" ]]; then
    run_mode "-fsanitize=address,undefined -fno-omit-frame-pointer" asan
fi
if [[ "$MODE" == "tsan" || "$MODE" == "both" ]]; then
    run_tsan
fi
echo "ALL SANITIZER RUNS CLEAN"
