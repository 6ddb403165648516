// Differential-test driver for the REFERENCE token normalizer
// (index/src/TextPreprocessor.h TokenNormalizer::normalize + the stopword
// filter) vs mithril_spark.text.normalize.
//
// stdin:  per token, "<field> <len>\n" + bytes + "\n"
// stdout: per token, "<len>\n" + normalized bytes + "\n"

#include <cstdint>
#include <iostream>
#include <string>

#include "TextPreprocessor.h"

int main() {
    std::ios::sync_with_stdio(false);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t sp = line.find(' ');
        int field = std::stoi(line.substr(0, sp));
        size_t n = std::stoul(line.substr(sp + 1));
        std::string tok(n, '\0');
        std::cin.read(tok.data(), static_cast<std::streamsize>(n));
        std::cin.get();
        std::string norm = mithril::TokenNormalizer::normalize(
            tok, static_cast<mithril::FieldType>(field));
        std::cout << norm.size() << '\n';
        std::cout.write(norm.data(), static_cast<std::streamsize>(norm.size()));
        std::cout << '\n';
    }
    return 0;
}
