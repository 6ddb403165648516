// No-op stub (vendored spdlog absent); see shim/spdlog/spdlog.h.
#pragma once
#include "../spdlog.h"
