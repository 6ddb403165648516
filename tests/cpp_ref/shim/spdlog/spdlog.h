// No-op spdlog shim (the vendored external/spdlog is empty in this
// snapshot). Only logging is stubbed; no behavior depends on it.
#pragma once

#define SPDLOG_TRACE(...) (void)0
#define SPDLOG_DEBUG(...) (void)0
#define SPDLOG_INFO(...) (void)0
#define SPDLOG_WARN(...) (void)0
#define SPDLOG_ERROR(...) (void)0

#include <memory>
#include <string>

namespace spdlog {
namespace level {
enum level_enum { trace = 0, debug, info, warn, err, critical, off };
}  // namespace level

class logger {
public:
    void flush_on(level::level_enum) {}
    void flush() {}
    template <typename... Args> void trace(Args&&...) {}
    template <typename... Args> void debug(Args&&...) {}
    template <typename... Args> void info(Args&&...) {}
    template <typename... Args> void warn(Args&&...) {}
    template <typename... Args> void error(Args&&...) {}
    template <typename... Args> void critical(Args&&...) {}
};

inline std::shared_ptr<logger> basic_logger_mt(const std::string&,
                                               const std::string&) {
    return std::make_shared<logger>();
}

inline void set_level(level::level_enum) {}
inline void set_pattern(const std::string&) {}
inline std::shared_ptr<logger> get(const std::string&) {
    return std::make_shared<logger>();
}

template <typename... Args> inline void trace(Args&&...) {}
template <typename... Args> inline void debug(Args&&...) {}
template <typename... Args> inline void info(Args&&...) {}
template <typename... Args> inline void warn(Args&&...) {}
template <typename... Args> inline void error(Args&&...) {}
template <typename... Args> inline void critical(Args&&...) {}
}  // namespace spdlog
