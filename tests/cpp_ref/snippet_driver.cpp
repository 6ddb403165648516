// Differential-test driver for the REFERENCE snippet generator
// (web/src/Snippets.h) vs mithril_spark.snippets.
//
// The reference's generateSnippet needs a document store; its text-based
// extraction chain (Snippets.h:199-216) is driven here directly on the
// private extractors (std headers are pre-included so `#define private
// public` cannot corrupt libstdc++ internals):
//
// stdin, one request per line group (lengths are byte counts, payloads
// are read exactly and followed by one '\n'):
//   "T <ntitle> <ndesc> <nbody>\n" then that many "<len>\n<word>\n"
//       -> getDocumentText of a Document with those word vectors (the
//          combinedText -> description -> "" fallback chain that
//          mithril_spark.snippets.combined_text transcribes)
//   "G <text_len> <nterms> <npos>\n" "<text>\n" then nterms
//       "<len>\n<term>\n", then npos groups "<len>\n<term>\n<count>
//       <p1> ... <pn>\n"
//       -> the generateSnippet text chain: positions-first, substring,
//          fallback (exactly Snippets.h:199-216 minus the doc fetch)
// Response: "<len>\n<snippet bytes>\n"

#include <algorithm>
#include <cctype>
#include <chrono>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <exception>
#include <filesystem>
#include <iomanip>
#include <iostream>
#include <mutex>
#include <optional>
#include <sstream>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

#include <spdlog/spdlog.h>

#include "data/Deserialize.h"
#include "data/Document.h"
#include "data/Gzip.h"
#include "data/Reader.h"

#define private public
#include "Snippets.h"
#undef private

static std::string read_n(std::istream& in, size_t n) {
    std::string s(n, '\0');
    in.read(s.data(), static_cast<std::streamsize>(n));
    in.ignore(1);  // trailing '\n'
    return s;
}

static void respond(const std::string& s) {
    std::cout << s.size() << "\n" << s << "\n" << std::flush;
}

int main() {
    mithril::DocumentAccessor acc("");
    mithril::SnippetGenerator gen(acc);

    std::string op;
    while (std::cin >> op) {
        if (op == "T") {
            size_t nt, nd, nb;
            std::cin >> nt >> nd >> nb;
            std::cin.ignore(1);
            mithril::data::Document doc{};
            auto fill = [&](std::vector<std::string>& v, size_t n) {
                for (size_t i = 0; i < n; i++) {
                    size_t len;
                    std::cin >> len;
                    std::cin.ignore(1);
                    v.push_back(read_n(std::cin, len));
                }
            };
            fill(doc.title, nt);
            fill(doc.description, nd);
            fill(doc.words, nb);
            respond(acc.getDocumentText(doc));
        } else if (op == "G") {
            size_t text_len, nterms, npos;
            std::cin >> text_len >> nterms >> npos;
            std::cin.ignore(1);
            std::string text = read_n(std::cin, text_len);
            std::vector<std::string> terms;
            for (size_t i = 0; i < nterms; i++) {
                size_t len;
                std::cin >> len;
                std::cin.ignore(1);
                terms.push_back(read_n(std::cin, len));
            }
            std::unordered_map<std::string, std::vector<uint16_t>> positions;
            for (size_t i = 0; i < npos; i++) {
                size_t len;
                std::cin >> len;
                std::cin.ignore(1);
                std::string term = read_n(std::cin, len);
                size_t cnt;
                std::cin >> cnt;
                std::vector<uint16_t> ps(cnt);
                for (size_t j = 0; j < cnt; j++) {
                    unsigned v;
                    std::cin >> v;
                    ps[j] = static_cast<uint16_t>(v);
                }
                std::cin.ignore(1);
                positions[term] = std::move(ps);
            }
            // generateSnippet's text chain, Snippets.h:195-216 verbatim
            std::string out;
            if (text.empty()) {
                out = "No content available";
            } else {
                if (!positions.empty()) {
                    out = gen.extractSnippetFromPositions(text, positions, terms);
                }
                if (out.empty()) {
                    out = gen.extractSnippetFromSubstring(text, terms);
                }
                if (out.empty()) {
                    out = gen.getFallbackSnippet(text);
                }
            }
            respond(out);
        } else {
            return 2;
        }
    }
    return 0;
}
