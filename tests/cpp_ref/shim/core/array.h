// Shim for the reference's vendored lib/: core::Array = std::array.
#pragma once
#include <array>

namespace core {
template <typename T, std::size_t N>
using Array = std::array<T, N>;
}  // namespace core
