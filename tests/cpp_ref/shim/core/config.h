// Shim for the reference's vendored config reader: parses the
// "key: value" format of ranking/config/*.conf. The file is resolved
// under $MITHRIL_CONF_DIR (the tests point it at
// /root/reference/ranking/config so the REAL shipped values load).
#pragma once
#include <cstdlib>
#include <fstream>
#include <stdexcept>
#include <string>
#include <unordered_map>

namespace core {
class Config {
    std::unordered_map<std::string, std::string> kv_;

    static std::string trim(const std::string& s) {
        size_t a = s.find_first_not_of(" \t\r\n");
        if (a == std::string::npos) return "";
        size_t b = s.find_last_not_of(" \t\r\n");
        return s.substr(a, b - a + 1);
    }

public:
    explicit Config(const std::string& name) {
        const char* dir = std::getenv("MITHRIL_CONF_DIR");
        std::string path = dir ? std::string(dir) + "/" + name : name;
        std::ifstream f(path);
        std::string line;
        while (std::getline(f, line)) {
            if (line.empty() || line[0] == '#') continue;
            size_t c = line.find(':');
            if (c == std::string::npos) continue;
            kv_[trim(line.substr(0, c))] = trim(line.substr(c + 1));
        }
    }

    int GetInt(const std::string& k) const { return std::stoi(kv_.at(k)); }
    float GetFloat(const std::string& k) const { return std::stof(kv_.at(k)); }
    std::string GetString(const std::string& k) const { return kv_.at(k); }
};
}  // namespace core

// The reference writes "core::Config" from inside namespace mithril::*;
// when a TU also sees the mithril::core shims (mem_map_file), unqualified
// lookup finds mithril::core first — alias Config there too.
namespace mithril::core {
using ::core::Config;
}  // namespace mithril::core
