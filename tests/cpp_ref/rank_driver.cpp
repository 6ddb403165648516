// Differential-test driver for the REFERENCE rankers vs
// mithril_spark.ranking: static URL rank (StaticRanker.cpp), the dynamic
// linear model incl. its uint32 cast (DynamicRanker.cpp), and
// OrderedMatchScore. Weights load from the REAL shipped conf files via
// $MITHRIL_CONF_DIR (core/config.h shim).
//
// stdin, one request per line group:
//   "S <len>\n<url>\n"                      -> "<double bits hex>\n"
//   "D <16 float-bit hex words>\n"          -> "<uint32>\n"
//      feature order: bm25 qt qu qd qb covt denst ord covu densu covd
//                     densd ept epb static pagerank (RankerFeatures order
//                     is fixed in code; booleans passed as 0/1 floats)
//   "O <nq> <nt>\n" then nq + nt lines "<len>\n<tok>\n" -> "<float bits hex>\n"

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "DynamicRanker.h"
#include "StaticRanker.h"

using namespace mithril::ranking;

static std::string read_n(std::istream& in, size_t n) {
    std::string s(n, '\0');
    in.read(s.data(), static_cast<std::streamsize>(n));
    in.get();  // trailing '\n'
    return s;
}

static std::string read_block(std::istream& in) {
    std::string line;
    std::getline(in, line);
    return read_n(in, std::stoul(line));
}

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        std::istringstream ls(line);
        char op;
        ls >> op;
        if (op == 'S') {
            size_t n;
            ls >> n;
            std::string url = read_n(std::cin, n);
            double r = GetUrlStaticRank(url);
            uint64_t bits;
            std::memcpy(&bits, &r, 8);
            std::printf("%016llx\n", static_cast<unsigned long long>(bits));
        } else if (op == 'D') {
            uint32_t w[16];
            for (auto& x : w) {
                std::string h;
                ls >> h;
                x = static_cast<uint32_t>(std::stoul(h, nullptr, 16));
            }
            float f[16];
            std::memcpy(f, w, sizeof(f));
            dynamic::RankerFeatures feat{};
            feat.bm25 = f[0];
            feat.query_in_title = f[1] != 0.0F;
            feat.query_in_url = f[2] != 0.0F;
            feat.query_in_description = f[3] != 0.0F;
            feat.query_in_body = f[4] != 0.0F;
            feat.coverage_percent_query_title = f[5];
            feat.density_percent_query_title = f[6];
            feat.order_sensitive_title = f[7];
            feat.coverage_percent_query_url = f[8];
            feat.density_percent_query_url = f[9];
            feat.coverage_percent_query_description = f[10];
            feat.density_percent_query_description = f[11];
            feat.earliest_pos_title = f[12];
            feat.earliest_pos_body = f[13];
            feat.static_rank = f[14];
            feat.pagerank = f[15];
            std::printf("%u\n", dynamic::GetUrlDynamicRank(feat));
        } else if (op == 'O') {
            size_t nq, nt;
            ls >> nq >> nt;
            std::vector<std::pair<std::string, int>> q;
            for (size_t i = 0; i < nq; ++i)
                q.emplace_back(read_block(std::cin), 1);
            std::vector<std::string> t;
            for (size_t i = 0; i < nt; ++i)
                t.push_back(read_block(std::cin));
            float r = dynamic::OrderedMatchScore(q, t);
            uint32_t bits;
            std::memcpy(&bits, &r, 4);
            std::printf("%08x\n", bits);
        }
        std::fflush(stdout);
    }
    return 0;
}
