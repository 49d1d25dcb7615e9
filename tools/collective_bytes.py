"""Count the collective bytes of one sharded WCSPH step (the 1e9 bridge).

Lowers the ShardedWCSPH step (and an amortized R-group) for an N-device
mesh, compiles it on the virtual CPU mesh, and walks the optimized HLO for
communication ops (collective-permute, all-to-all, all-gather, all-reduce,
reduce-scatter), summing each op's output bytes.  The SPMD partitioner
inserts the SAME collective structure on the virtual mesh as on a real ICI
mesh, so the byte counts are hardware-faithful even though the timing is
not — this is the measured input to the multi-chip scaling model in
docs/design.md ("The bridge to 1e9").

Usage:
    python tools/collective_bytes.py [--devices 8] [--radius 0.02]
        [--resort 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# one HLO op result can be a tuple: capture every dtype[shape] group on
# the lhs of the op
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                       r"\[([0-9,]*)\]")
_COLLECTIVES = ("collective-permute", "all-to-all", "all-gather",
                "all-reduce", "reduce-scatter")


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict[str, dict[str, float]]:
    """Per-collective-kind {count, bytes} from optimized HLO text.

    Bytes = the op's OUTPUT bytes (per device, since SPMD HLO is the
    per-device program) — for permute/gather that is what crosses the
    link; all-reduce moves ~2x in a ring, noted by the caller."""
    out: dict[str, dict[str, float]] = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+ = (.+?) (collective-permute|all-to-all|"
                     r"all-gather|all-reduce|reduce-scatter)", line)
        if not m:
            continue
        kind = m.group(2)
        b = _shape_bytes(m.group(1))
        d = out.setdefault(kind, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += b
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--radius", type=float, default=0.02)
    ap.add_argument("--resort", type=int, default=2)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import tisph_tpu as tt
    from tisph_tpu.ops.neighbors import SweepConfig
    from tisph_tpu.parallel import ShardedWCSPH, make_mesh

    scene = tt.scene_from_dict({
        "configuration": {
            "dim": 3, "domainStart": [0.0, 0.0, 0.0],
            "domainEnd": [1.0, 1.0, 1.0], "particleRadius": args.radius,
            "density0": 1000, "gravitation": [0.0, -9.81, 0.0], "c_s": 50.0,
        },
        "fluidBlocks": [
            {"start": [0.1, 0.1, 0.1], "end": [0.9, 0.6, 0.9],
             "velocity": [0.0, -0.5, 0.2], "density": 1000.0,
             "color": [50, 100, 200]}
        ],
        "rigidBodies": [],
    })
    mesh = make_mesh(args.devices)
    cfg = SweepConfig(
        impl="pallas", block_size=128, window_cap=1152, tile=128,
        interpret=True, layout="seg", resort_every=args.resort,
    )
    solver = ShardedWCSPH(scene, mesh, sweep_cfg=cfg)
    state = solver.bind(tt.build_state(scene))
    n = int(jax.device_get(state.num_active))
    hops = solver._hops()
    n_per = state.capacity // args.devices

    def report(name, fn, nsub):
        compiled = jax.jit(fn).lower(state).compile()
        cb = collective_bytes(compiled.as_text())
        total = sum(d["bytes"] for d in cb.values())
        print(f"-- {name} (per device, per dispatch):")
        for k, d in sorted(cb.items()):
            print(f"   {k:<20s} x{int(d['count']):3d}  "
                  f"{d['bytes'] / 1e6:8.3f} MB")
        print(f"   TOTAL {total / 1e6:.3f} MB  "
              f"(per substep: {total / 1e6 / nsub:.3f} MB)")
        return {k: d["bytes"] for k, d in cb.items()} | {"total": total}

    print(f"devices={args.devices}  particles={n}  capacity={state.capacity}"
          f"  per-shard={n_per}  halo={solver.halo} rows  hops={hops}")
    res = {
        "devices": args.devices, "particles": n,
        "per_shard": n_per, "halo_rows": int(solver.halo), "hops": int(hops),
    }
    res["step"] = report("full step (R=1)", solver._step_fn, 1)
    R = args.resort
    if R > 1:
        def group(s):
            s, cache = solver._seg_build(s)
            for _ in range(R):
                s = solver._seg_apply(s, cache)
            return s

        res[f"group_R{R}"] = report(f"R={R} group (build + {R} substeps)",
                                    group, R)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
