// Shim for the reference's vendored core/mem_map_file.h (the lib/ tree is
// EMPTY in the snapshot, like the other shims here). This is a REAL
// read-only mmap implementation — the end-to-end query differential loads
// actual index files through it — covering every member the reference
// sources use: construction from a path (+ optional flag), data(), size().
// A missing/empty file maps to (nullptr, 0) rather than throwing, matching
// the reference's tolerance for absent optional index parts.
#ifndef SHIM_CORE_MEM_MAP_FILE_H
#define SHIM_CORE_MEM_MAP_FILE_H

#include <cstddef>
#include <string>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace mithril::core {

class MemMapFile {
public:
    MemMapFile() = default;

    explicit MemMapFile(const std::string& path, bool /*flag*/ = false) {
        int fd = ::open(path.c_str(), O_RDONLY);
        if (fd < 0) {
            return;
        }
        struct stat st {};
        if (::fstat(fd, &st) == 0 && st.st_size > 0) {
            void* p = ::mmap(nullptr, static_cast<size_t>(st.st_size),
                             PROT_READ, MAP_PRIVATE, fd, 0);
            if (p != MAP_FAILED) {
                data_ = static_cast<const char*>(p);
                size_ = static_cast<size_t>(st.st_size);
            }
        }
        ::close(fd);
    }

    MemMapFile(const MemMapFile&) = delete;
    MemMapFile& operator=(const MemMapFile&) = delete;

    MemMapFile(MemMapFile&& o) noexcept : data_(o.data_), size_(o.size_) {
        o.data_ = nullptr;
        o.size_ = 0;
    }

    MemMapFile& operator=(MemMapFile&& o) noexcept {
        if (this != &o) {
            unmap();
            data_ = o.data_;
            size_ = o.size_;
            o.data_ = nullptr;
            o.size_ = 0;
        }
        return *this;
    }

    ~MemMapFile() { unmap(); }

    const char* data() const { return data_; }
    size_t size() const { return size_; }

private:
    void unmap() {
        if (data_ != nullptr) {
            ::munmap(const_cast<char*>(data_), size_);
        }
    }

    const char* data_ = nullptr;
    size_t size_ = 0;
};

}  // namespace mithril::core

#endif
