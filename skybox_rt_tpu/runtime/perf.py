"""Performance counters — the MPM / vx_dump_perf analog (SURVEY §2.2 H6).

The reference multiplexes per-unit hardware counters through the MPM CSR
file (classes: pipeline, memsys, tex, raster, om — VX_types.vh:33-40;
aggregation runtime/stub/utils.cpp:159-340).  Cycle-level counters do not
exist under XLA, so the TPU framework reports the two layers that do:

  * measured: wall/device time, launches, bytes to/from host, Mpix/s, rays/s
  * analytic per-draw traffic model (the S6/S7/S8 mem-trace analog):
    raster reads (tile headers + pid lists + edge data), tex reads
    (texel fetches), om reads/writes (zbuf/cbuf words) — computed from the
    binning output exactly as the reference's units would issue them
"""
from __future__ import annotations

import collections
import sys


class PerfCounters:
    def __init__(self):
        self.counters = collections.Counter()
        self.times_ms = collections.Counter()

    def count(self, name: str, value=1):
        self.counters[name] += value

    def add_time(self, name: str, ms: float):
        self.times_ms[name] += ms

    def merge(self, other: "PerfCounters"):
        self.counters.update(other.counters)
        self.times_ms.update(other.times_ms)

    def as_dict(self) -> dict:
        out = dict(self.counters)
        out.update({k: v for k, v in self.times_ms.items()})
        return out

    def dump(self, file=None):
        file = file or sys.stdout
        print("PERF: " + "-" * 50, file=file)
        for k in sorted(self.counters):
            print(f"PERF: {k:<36} {self.counters[k]:>14}", file=file)
        for k in sorted(self.times_ms):
            print(f"PERF: {k:<36} {self.times_ms[k]:>14.3f} ms", file=file)


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA's own cost model for a jittable fn — the flop/byte counters the
    MPM classes expose in hardware (SURVEY §5a perf counters).

    Returns {"flops": .., "bytes_accessed": .., "utilization_hints": {...}}
    plus everything else XLA reports.  Use with the measured wall time for
    a roofline check: flops/time vs peak, bytes/time vs HBM bandwidth.
    """
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analyses = compiled.cost_analysis()
    # cost_analysis returns one dict per device program (jax>=0.4 returns
    # a plain dict on recent versions)
    if isinstance(analyses, (list, tuple)):
        analyses = analyses[0] if analyses else {}
    out = {"flops": float(analyses.get("flops", 0.0)),
           "bytes_accessed": float(analyses.get("bytes accessed", 0.0))}
    out.update({k: v for k, v in analyses.items()
                if isinstance(v, (int, float))})
    return out


def drawcall_traffic(binned, render_state, counts: dict | None = None) -> dict:
    """Memory-traffic model for one binned drawcall.

    Mirrors what the reference's units issue per draw:
      raster: tile header (8B) + pid word (4B/pid) + 9 edge words per
              pid-reference (raster_unit.cpp:153-204) — exact from binning
      tex:    4 texel fetches per textured fragment (bilinear) or 1 (point)
      om:     conditional zbuf/cbuf read + write words (om_unit.cpp:85-136)

    counts: MEASURED fragment counts from
    ops.deferred.measure_drawcall_counts ({"fragments", "om_passing"}) —
    the emulator.cpp:416-545 measured-counter semantics: tex reads and OM
    reads are per covered fragment, OM writes per ds-passing fragment.
    Without counts, fragments fall back to the coverage-area upper bound
    (every pid covers its whole tile) and keys carry a ``_ub`` suffix.
    """
    om = render_state.om
    flags = render_state.flags
    num_tiles = binned.num_tiles
    total_pid_refs = int(binned.tile_pid_count.sum())

    raster_reads = num_tiles * 8 + total_pid_refs * (4 + 9 * 4)

    measured = counts is not None
    if measured:
        frags = int(counts["fragments"])
        passing = int(counts["om_passing"])
    else:
        ts = 1 << binned.tile_logsize
        # conservative fragment upper bound: every pid covers its whole tile
        frags = total_pid_refs * ts * ts
        passing = frags
    suffix = "" if measured else "_ub"

    if flags.tex_enabled and render_state.tex is not None:
        import skybox_rt_tpu.core.constants as C
        stride = C.TEX_FORMAT_STRIDE[render_state.tex.format]
        texels = 4 if render_state.tex.filter == C.TEX_FILTER_BILINEAR else 1
        tex_reads = frags * texels * stride
    else:
        tex_reads = 0

    depth_en = om.ds.depth_enabled
    stencil_en = om.ds.stencil_enabled(False) or om.ds.stencil_enabled(True)
    om_reads = frags * 4 * (
        (1 if (depth_en or stencil_en) else 0)
        + (1 if (om.color_write and om.blend.enabled) else 0))
    om_writes = passing * 4 * (
        (1 if (depth_en and om.depth_writemask) or stencil_en else 0)
        + (1 if om.color_write else 0))

    out = {
        "raster_mem_reads_bytes": raster_reads,
        f"tex_mem_reads_bytes{suffix}": tex_reads,
        f"om_mem_reads_bytes{suffix}": om_reads,
        f"om_mem_writes_bytes{suffix}": om_writes,
        "tiles": num_tiles,
        "prims": binned.num_prims,
    }
    if measured:
        out["fragments"] = frags
        out["om_write_fragments"] = passing
    else:
        out["fragments_upper_bound"] = frags
    return out
