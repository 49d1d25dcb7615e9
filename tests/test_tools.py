"""Tool-layer unit tests: the collective-bytes HLO parser.

The parser's steady/conditional split backs the design doc's
"zero steady-state all-gather" claim, so its corner cases (a collective
that is a computation ROOT, conditional-only reachability) get their own
gates (ADVICE r4 #1).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

from collective_bytes import collective_bytes  # noqa: E402


_HLO = """\
HloModule jit_step

%fallback_sort (p0: f32[256]) -> f32[256] {
  %p0 = f32[256] parameter(0)
  ROOT %ag = f32[2048] all-gather(%p0), replica_groups={}
}

%steady_path (p1: f32[256]) -> f32[256] {
  %p1 = f32[256] parameter(0)
  ROOT %cp = f32[256] collective-permute(%p1), source_target_pairs={{0,1}}
}

ENTRY %main (arg: f32[256]) -> f32[256] {
  %arg = f32[256] parameter(0)
  %pred0 = pred[] constant(false)
  %sum = f32[128] all-reduce(%arg), to_apply=%add
  %c = f32[256] conditional(%pred0, %arg, %arg), true_computation=%fallback_sort, false_computation=%steady_path
  ROOT %root_cp = f32[512] collective-permute(%c), source_target_pairs={{0,1}}
}

%add (a: f32[], b: f32[]) -> f32[] {
  %a = f32[] parameter(0)
  %b = f32[] parameter(1)
  ROOT %r = f32[] add(%a, %b)
}
"""


class TestCollectiveBytesParser:
    def test_root_collective_is_counted(self):
        """A collective that is a computation ROOT must not be dropped
        (ADVICE r4: the old regex required a non-ROOT lhs)."""
        out = collective_bytes(_HLO)
        # entry's ROOT collective-permute: f32[512] = 2048 bytes
        cp = out["steady"]["collective-permute"]
        assert cp["count"] == 1
        assert cp["bytes"] == 512 * 4

    def test_conditional_branches_split(self):
        out = collective_bytes(_HLO)
        # both branch computations are conditional-only; the fallback's
        # ROOT all-gather must land in 'conditional', not 'steady'
        assert "all-gather" not in out["steady"]
        ag = out["conditional"]["all-gather"]
        assert ag["count"] == 1
        assert ag["bytes"] == 2048 * 4
        # the steady-branch permute is also conditional (reachable only
        # through the conditional), and is a ROOT line too
        assert out["conditional"]["collective-permute"]["bytes"] == 256 * 4

    def test_unconditional_allreduce_is_steady(self):
        out = collective_bytes(_HLO)
        ar = out["steady"]["all-reduce"]
        assert ar["count"] == 1
        assert ar["bytes"] == 128 * 4
