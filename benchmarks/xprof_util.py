"""Shared xprof helpers for the benchmark scripts.

Converts a raw jax.profiler trace directory into the op_profile JSON that
benchmarks/op_table.py summarizes. Needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python set before protobuf import
(the tensorboard_plugin_profile convert path is broken with this TF).
"""
from __future__ import annotations

import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def trace_to_op_profile(trace_dir: str, out_path: str) -> dict:
    """Parse the xplane under trace_dir, write op_profile JSON to out_path."""
    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    print(f"xplane files: {pbs}", file=sys.stderr)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(pbs, "op_profile", {})
    prof = json.loads(data) if isinstance(data, (str, bytes)) else data
    with open(out_path, "w") as f:
        json.dump(prof, f)
    print(f"wrote {out_path}", file=sys.stderr)
    return prof
