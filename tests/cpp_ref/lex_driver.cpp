// Differential-test driver for the REFERENCE query lexer
// (query/src/Lexer.cpp) vs mithril_spark.query.grammar.lex.
//
// stdin:  per query, "<len>\n" + bytes + "\n"
// stdout: per query, one line per token "T <enum_int> <len>\n<value>\n",
//         then "E 0\n"; a lexing exception emits "X <len>\n<what>\n" + E.

#include <iostream>
#include <string>

#include "Lexer.h"

int main() {
    std::ios::sync_with_stdio(false);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t n = std::stoul(line);
        std::string q(n, '\0');
        std::cin.read(q.data(), static_cast<std::streamsize>(n));
        std::cin.get();
        try {
            Lexer lx(q);
            while (true) {
                Token t = lx.NextToken();
                std::cout << "T " << static_cast<int>(t.type) << ' '
                          << t.value.size() << '\n';
                std::cout.write(t.value.data(),
                                static_cast<std::streamsize>(t.value.size()));
                std::cout << '\n';
                if (t.type == TokenType::EOFTOKEN) break;
            }
        } catch (const std::exception& e) {
            std::string msg = e.what();
            std::cout << "X " << msg.size() << '\n' << msg << '\n';
        }
        std::cout << "E 0\n";
        std::cout.flush();
    }
    return 0;
}
