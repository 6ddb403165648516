// Shim for the reference's vendored core/mem_map_file.h (the lib/ tree is
// EMPTY in the snapshot, like the other shims here). The ISR differential
// driver never opens an index file: TermReader/PositionIndex are linked
// only for their typeinfo (TermAND's dynamic_cast) — so an inert,
// API-compatible stand-in suffices. Members cover every use in the linked
// sources: construction from a path (+ optional flag), data(), size().
#ifndef SHIM_CORE_MEM_MAP_FILE_H
#define SHIM_CORE_MEM_MAP_FILE_H

#include <cstddef>
#include <string>

namespace mithril::core {

class MemMapFile {
public:
    MemMapFile() = default;
    explicit MemMapFile(const std::string& /*path*/, bool /*writable*/ = false) {}
    const char* data() const { return nullptr; }
    size_t size() const { return 0; }

private:
    std::string path_;
};

}  // namespace mithril::core

#endif
