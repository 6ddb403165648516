// End-to-end query driver over the REFERENCE query stack: loads a real
// index built by the reference's own IndexBuilder (index/src/main.cpp,
// compiled separately) and answers queries through QueryManager —
// QueryEngine's ISR lowering + the full ranking pipeline — exactly as the
// production coordinator would.
//
// argv: <output_file> <index dirs...>. stdin: one query per line. The
// response protocol goes to the OUTPUT FILE (the reference sources print
// progress chatter to stdout, so stdout is not a clean channel):
//   "R <n>\n" then n lines "<docid> <score> <url>" then "END\n"

#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "QueryManager.h"

int main(int argc, char** argv) {
    if (argc < 3) {
        return 2;
    }
    std::ofstream out(argv[1], std::ios::trunc);
    std::vector<std::string> index_dirs;
    for (int i = 2; i < argc; ++i) {
        index_dirs.push_back(argv[i]);
    }
    QueryManager qm(index_dirs);

    std::string query;
    while (std::getline(std::cin, query)) {
        auto result = qm.AnswerQuery(query);
        out << "R " << result.size() << "\n";
        for (const auto& t : result) {
            out << std::get<0>(t) << " " << std::get<1>(t) << " "
                << std::get<2>(t) << "\n";
        }
        out << "END\n" << std::flush;
    }
    return 0;
}
