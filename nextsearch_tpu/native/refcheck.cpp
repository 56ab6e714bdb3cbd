// refcheck: standalone cross-validation harness for the BM25 parity anchor.
//
// Reads reference-format segment directories (both the legacy
// lexicon.bin/inverted.bin layout and the 64-barrel layout) with
// independently-written code following the format and scoring semantics of
// the reference engine:
//   - binary primitives:   /root/reference/include/indexio.hpp
//   - segment layout:      /root/reference/src/api_segment.cpp:45-137
//   - barrel layout:       /root/reference/include/barrels.hpp
//   - BM25 idf:            /root/reference/src/api_engine.cpp:45-47
//   - scoring loop:        /root/reference/src/api_engine.cpp:441-496
//     (per segment: per query term in order, per posting in file order,
//      score[doc] += qweight * idf * (tf*(k1+1)) / (tf + k1*(1-b+b*dl/avgdl))
//      all in float; found = sum over segments of matched-doc counts)
//
// This program exists so tests can assert that nextsearch_tpu's NumPy oracle
// (index/oracle.py) — the anchor every TPU kernel is tested against — is
// itself bit-identical to compiled C++ float semantics, closing the
// "is the oracle right?" loophole (VERDICT r1, missing item 4).
//
// Usage: refcheck SEGDIR [SEGDIR...]
//   stdin:  one query per line:  k w0 term0 [w1 term1 ...]
//   stdout: one line per query:  found hex(score):seg:doc ... (top-k,
//           sorted by score desc, then segment asc, then docId asc —
//           the framework's canonical refinement of the reference's
//           unspecified heap tie order)
//
// Build: g++ -O2 -std=c++17 -o refcheck refcheck.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace fs = std::filesystem;

static uint32_t read_u32(std::ifstream& in) { uint32_t v; in.read((char*)&v, 4); return v; }
static uint64_t read_u64(std::ifstream& in) { uint64_t v; in.read((char*)&v, 8); return v; }
static float read_f32(std::ifstream& in) { float v; in.read((char*)&v, 4); return v; }
static std::string read_str(std::ifstream& in) {
    uint32_t n = read_u32(in);
    std::string s(n, '\0');
    in.read(&s[0], n);
    return s;
}

struct LexEntry { uint32_t df = 0; uint64_t offset = 0; uint32_t count = 0; uint32_t barrel = 0; };

struct Segment {
    uint32_t N = 0;
    float avgdl = 0.f;
    std::vector<uint32_t> doc_len;
    std::unordered_map<std::string, LexEntry> lex;
    bool use_barrels = false;
    std::vector<std::ifstream> inv;  // 1 stream (legacy) or barrel_count
};

static bool load_segment(const fs::path& dir, Segment& s) {
    {
        std::ifstream in(dir / "stats.bin", std::ios::binary);
        if (!in) return false;
        s.N = read_u32(in);
        s.avgdl = read_f32(in);
    }
    {
        std::ifstream in(dir / "docs.bin", std::ios::binary);
        if (!in) return false;
        uint32_t n = read_u32(in);
        s.doc_len.resize(n);
        for (uint32_t i = 0; i < n; i++) {
            read_str(in);  // cord_uid
            read_str(in);  // title
            read_str(in);  // relpath
            s.doc_len[i] = read_u32(in);
        }
    }
    if (fs::exists(dir / "barrels.bin")) {
        s.use_barrels = true;
        uint32_t barrel_count, terms_per_barrel;
        {
            std::ifstream in(dir / "barrels.bin", std::ios::binary);
            barrel_count = read_u32(in);
            terms_per_barrel = read_u32(in);
            (void)terms_per_barrel;
        }
        s.inv.resize(barrel_count);
        char suffix[16];
        for (uint32_t b = 0; b < barrel_count; b++) {
            std::snprintf(suffix, sizeof(suffix), "%03u", b);
            s.inv[b].open(dir / ("inverted_b" + std::string(suffix) + ".bin"),
                          std::ios::binary);
            if (!s.inv[b]) return false;
            std::ifstream lx(dir / ("lexicon_b" + std::string(suffix) + ".bin"),
                             std::ios::binary);
            if (!lx) return false;
            uint32_t tcount = read_u32(lx);
            for (uint32_t i = 0; i < tcount; i++) {
                std::string term = read_str(lx);
                LexEntry e;
                read_u32(lx);  // termId (unused for scoring)
                e.df = read_u32(lx);
                e.offset = read_u64(lx);
                e.count = read_u32(lx);
                e.barrel = b;
                s.lex.emplace(std::move(term), e);
            }
        }
    } else {
        std::ifstream lx(dir / "lexicon.bin", std::ios::binary);
        if (!lx) return false;
        uint32_t tcount = read_u32(lx);
        for (uint32_t i = 0; i < tcount; i++) {
            std::string term = read_str(lx);
            LexEntry e;
            read_u32(lx);  // termId
            e.df = read_u32(lx);
            e.offset = read_u64(lx);
            e.count = read_u32(lx);
            s.lex.emplace(std::move(term), e);
        }
        s.inv.resize(1);
        s.inv[0].open(dir / "inverted.bin", std::ios::binary);
        if (!s.inv[0]) return false;
    }
    return true;
}

// Exact float op order of the reference's bm25_idf (api_engine.cpp:45-47);
// note N - df in uint32 before the float conversion.
static float bm25_idf(uint32_t N, uint32_t df) {
    return std::log((((N - df + 0.5f) / (df + 0.5f)) + 1.0f));
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: refcheck SEGDIR [SEGDIR...]\n");
        return 2;
    }
    std::vector<Segment> segs(argc - 1);
    for (int i = 1; i < argc; i++) {
        if (!load_segment(argv[i], segs[i - 1])) {
            std::fprintf(stderr, "failed to load segment: %s\n", argv[i]);
            return 2;
        }
    }

    const float k1 = 1.2f, b = 0.75f;  // api_engine.cpp:375-376
    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream ls(line);
        int K;
        if (!(ls >> K)) continue;
        std::vector<std::pair<std::string, float>> qterms;
        float w;
        std::string term;
        while (ls >> w >> term) qterms.push_back({term, w});

        struct Hit { float s; uint32_t seg; uint32_t doc; };
        std::vector<Hit> hits;
        uint64_t total_found = 0;
        for (uint32_t si = 0; si < segs.size(); si++) {
            Segment& seg = segs[si];
            std::unordered_map<uint32_t, float> score;
            for (auto& tw : qterms) {
                auto it = seg.lex.find(tw.first);
                if (it == seg.lex.end()) continue;
                const LexEntry& e = it->second;
                if (e.df == 0) continue;
                float idf = bm25_idf(seg.N, e.df);
                std::ifstream& inv = seg.inv[seg.use_barrels ? e.barrel : 0];
                inv.clear();
                inv.seekg((std::streamoff)e.offset, std::ios::beg);
                for (uint32_t i = 0; i < e.count; i++) {
                    uint32_t docId = read_u32(inv);
                    uint32_t tf = read_u32(inv);
                    float dl = (float)seg.doc_len[docId];
                    float denom = (float)tf + k1 * (1.0f - b + b * (dl / seg.avgdl));
                    float sc = idf * ((float)tf * (k1 + 1.0f)) / denom;
                    score[docId] += tw.second * sc;
                }
            }
            for (auto& kv : score) hits.push_back({kv.second, si, kv.first});
            total_found += score.size();
        }
        std::sort(hits.begin(), hits.end(), [](const Hit& a, const Hit& h) {
            if (a.s != h.s) return a.s > h.s;
            if (a.seg != h.seg) return a.seg < h.seg;
            return a.doc < h.doc;
        });
        if ((int)hits.size() > K) hits.resize(K);
        std::printf("%llu", (unsigned long long)total_found);
        for (auto& h : hits) {
            uint32_t bits;
            std::memcpy(&bits, &h.s, 4);
            std::printf(" %08x:%u:%u", bits, h.seg, h.doc);
        }
        std::printf("\n");
    }
    return 0;
}
