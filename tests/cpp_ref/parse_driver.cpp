// Differential-test driver: run the REFERENCE HTML parser
// (common/src/html/Parser.cpp) on html payloads from stdin and emit its
// parse fields for byte-exact comparison with mithril_spark.text.htmlparse.
//
// Protocol (stdin):  "<html_len>\n" followed by that many raw bytes, then
// one '\n'; repeat until EOF.
// Protocol (stdout): per document, length-prefixed sections
//   W/T/B/L/M/K <len>\n<bytes>\n   then  "E 0\n".
//   W = body words joined by ' ', T = title words, B = base, L = lang,
//   M = description meta, K = links as url\x1fanchor-words\x1e...

#include "html/Parser.h"

#include <iostream>
#include <string>
#include <string_view>

using namespace mithril;

static void emit(char tag, const std::string& payload) {
    std::cout << tag << ' ' << payload.size() << '\n';
    std::cout.write(payload.data(), static_cast<std::streamsize>(payload.size()));
    std::cout << '\n';
}

static std::string join(const std::vector<std::string_view>& words) {
    std::string out;
    for (size_t i = 0; i < words.size(); ++i) {
        if (i) out += ' ';
        out.append(words[i]);
    }
    return out;
}

int main() {
    std::ios::sync_with_stdio(false);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t n = std::stoul(line);
        std::string html(n, '\0');
        std::cin.read(html.data(), static_cast<std::streamsize>(n));
        std::cin.get();  // trailing '\n'

        html::ParsedDocument doc;
        html::ParseDocument(std::string_view{html.data(), html.size()}, doc);

        emit('W', join(doc.words));
        emit('T', join(doc.titleWords));
        emit('B', std::string{doc.base});
        emit('L', std::string{doc.lang});
        auto it = doc.metas.find(std::string_view{"description"});
        emit('M', it == doc.metas.end() ? std::string{"\x00MISSING", 8}
                                        : std::string{it->second});
        std::string links;
        for (const auto& l : doc.links) {
            links.append(l.url);
            links += '\x1f';
            links += join(l.anchorText);
            links += '\x1e';
        }
        emit('K', links);
        std::cout << "E 0\n";
        std::cout.flush();
    }
    return 0;
}
