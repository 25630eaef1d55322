/* Minimal ImGui stub: only what the BSDF render_debugger_node methods
 * reference.  The oracle never renders UI; TreeNode returning false makes
 * every debugger body dead code. */
#pragma once

namespace ImGui {
static inline bool TreeNode(const void*, const char*, ...) { return false; }
static inline void TreePop() {}
}

namespace CGL {
inline bool DragDouble3(const char*, const double*, float) { return false; }
inline bool DragDouble(const char*, const double*, float) { return false; }
inline bool SliderDouble3(const char*, const double*, float, float) {
    return false;
}
}
