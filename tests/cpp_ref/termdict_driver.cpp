// Term-dictionary probe over a REAL reference index: reports the total
// term count and the postings_count (df) of each requested term — the
// end-to-end differential uses it to prove the reference's dictionary is
// IDENTICAL to ours (equal size + every one of our terms present with an
// equal df == the mappings are the same set).
//
// argv: <out_file> <index_dir>. stdin: "<len>\n<term bytes>\n" groups.
// out_file: first line "SIZE <n>", then one "<df|-1>" line per term.

#include <cstring>
#include <fstream>
#include <iostream>
#include <string>

#include "TermDictionary.h"

static std::string read_n(std::istream& in, size_t n) {
    std::string s(n, '\0');
    in.read(s.data(), static_cast<std::streamsize>(n));
    in.ignore(1);
    return s;
}

int main(int argc, char** argv) {
    if (argc != 3) {
        return 2;
    }
    std::ofstream out(argv[1], std::ios::trunc);
    mithril::TermDictionary td(argv[2]);
    out << "SIZE " << td.size() << "\n";
    size_t len;
    while (std::cin >> len) {
        std::cin.ignore(1);
        std::string term = read_n(std::cin, len);
        auto e = td.lookup(term);
        if (e.has_value()) {
            out << e->postings_count << "\n";
        } else {
            out << -1 << "\n";
        }
    }
    return 0;
}
