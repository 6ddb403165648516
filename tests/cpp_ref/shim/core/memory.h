// Shim for the reference's vendored lib/ (not checked out in this
// snapshot): core::UniquePtr / core::MakeUnique as used by
// common/include/html/Parser.h. Standard-library passthrough only.
#pragma once
#include <memory>
#include <utility>

namespace core {
template <typename T>
using UniquePtr = std::unique_ptr<T>;

template <typename T, typename... Args>
UniquePtr<T> MakeUnique(Args&&... args) {
    return std::make_unique<T>(std::forward<Args>(args)...);
}
}  // namespace core
