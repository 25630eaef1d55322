#!/usr/bin/env python3
"""Instrument a COPY of the reference tree with pd_dump hooks.

Usage: python instrument.py <copied_reference_root>

Applies five anchored insertions to src/pathtracer/bidirection.cpp and
installs pd_dump.h.  Anchor-based (not line-number diffs) so it is robust
to whitespace drift; every anchor must match exactly once or this fails
loudly.  Only the copy is modified — never /root/reference itself.
"""

import os
import shutil
import sys

HOOKS = [
    # include
    ('#include "scene/triangle.h"',
     '#include "scene/triangle.h"\n#include "pd_dump.h"'),
    # raytrace_pixel entry: activate dumping for selected pixels
    ("  Vector2D origin = Vector2D(x, y); // bottom left corner of the pixel",
     "  Vector2D origin = Vector2D(x, y); // bottom left corner of the pixel\n"
     "  pd::set_pixel(this, x, y);"),
    # both subpaths built (anchor on the light-path prepare call's tail —
    # the full call has trailing whitespace in the reference source)
    ("                                light_init_normal, true, light);",
     "                                light_init_normal, true, light);\n"
     "  pd::dump_paths(eye_path, light_path);"),
    # per-combo result
    ("      Vector3D L_in = estimate_bidirection_radiance(i, j, eye_path, light_path);",
     "      Vector3D L_in = estimate_bidirection_radiance(i, j, eye_path, light_path);\n"
     "      pd::dump_combo(i, j, L_in);"),
    # fresh light sample (t=1)
    ("      f_light = Vector3D(1., 1., 1.);\n      vl = light_sample;",
     "      f_light = Vector3D(1., 1., 1.);\n      vl = light_sample;\n"
     "      pd::dump_sample(\"LS\", i_eye, i_light, light_sample);"),
    # fresh eye sample (s=1)
    ("      f_eye = Vector3D(1., 1., 1.);\n      ve = eye_sample;",
     "      f_eye = Vector3D(1., 1., 1.);\n      ve = eye_sample;\n"
     "      pd::dump_sample(\"ES\", i_eye, i_light, eye_sample);"),
    # per-combo estimate with MIS weight and splat coordinates
    ("  ill = contrib * w;",
     "  ill = contrib * w;\n"
     "  pd::dump_est(i_eye, i_light, c, contrib, w, ill, eye_x, eye_y);"),
]


def main(root):
    target = os.path.join(root, "src", "pathtracer", "bidirection.cpp")
    src = open(target).read()
    for anchor, replacement in HOOKS:
        n = src.count(anchor)
        assert n == 1, f"anchor matched {n} times (want 1): {anchor[:60]!r}"
        src = src.replace(anchor, replacement)
    open(target, "w").write(src)
    here = os.path.dirname(os.path.abspath(__file__))
    shutil.copy(os.path.join(here, "pd_dump.h"),
                os.path.join(root, "src", "pathtracer", "pd_dump.h"))
    print(f"instrumented {target}")


if __name__ == "__main__":
    main(sys.argv[1])
