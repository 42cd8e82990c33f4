"""HLO traffic parser (utils/roofline.py hlo_traffic).

The audit's byte counts come from parsing optimized HLO text; verify the
parser on a synthetic module with known shapes: fusions/custom-calls get
operand+result bytes, layout/bookkeeping ops are excluded.
"""

from sgdm_tpu.utils.roofline import _shape_bytes, hlo_traffic

_HLO = """\
HloModule jit_step, entry_computation_layout={()->()}

%fused_computation.1 (p: f32[8,128]) -> f32[8,128] {
  %p = f32[8,128]{1,0} parameter(0)
  ROOT %m = f32[8,128]{1,0} multiply(%p, %p)
}

ENTRY %main (a: f32[8,128], b: bf16[4,256]) -> f32[8,128] {
  %a = f32[8,128]{1,0:T(8,128)} parameter(0)
  %b = bf16[4,256]{1,0:T(16,128)(2,1)} parameter(1)
  %fusion.1 = f32[8,128]{1,0:T(8,128)} fusion(%a), kind=kLoop, calls=%fused_computation.1
  %convert.5 = f32[4,256]{1,0:T(8,128)} convert(%b)
  %tuple.9 = (f32[8,128]{1,0}) tuple(%fusion.1)
  %gte = f32[8,128]{1,0} get-tuple-element(%tuple.9), index=0
  ROOT %custom-call.7 = (f32[8,128]{1,0:T(8,128)}, f32[4,256]{1,0}) custom-call(%gte, %convert.5), custom_call_target="tpu_custom_call"
}
"""


def test_shape_bytes():
    assert _shape_bytes("f32[8,128]{1,0}") == 8 * 128 * 4
    assert _shape_bytes("bf16[4,256]{1,0:T(16,128)(2,1)}") == 4 * 256 * 2
    assert _shape_bytes("(f32[2,2]{1,0}, bf16[4]{0})") == 16 + 8
    assert _shape_bytes("pred[]") == 1


def test_hlo_traffic_entry_ops():
    ops = hlo_traffic(_HLO)
    # bookkeeping excluded
    assert "tuple.9" not in ops and "gte" not in ops and "a" not in ops
    f = ops["fusion.1"]
    assert f.kind == "fusion"
    assert f.out_bytes == 8 * 128 * 4
    assert f.in_bytes == 8 * 128 * 4  # one f32[8,128] operand
    cc = ops["custom-call.7"]
    assert cc.out_bytes == 8 * 128 * 4 + 4 * 256 * 4
    assert cc.in_bytes == 8 * 128 * 4 + 4 * 256 * 4
    cv = ops["convert.5"]
    assert cv.out_bytes == 4 * 256 * 4
    assert cv.in_bytes == 4 * 256 * 2


_HLO_WHILE = _HLO.replace(
    "ENTRY %main",
    """\
%while_body (s: f32[8,128]) -> f32[8,128] {
  %s = f32[8,128]{1,0} parameter(0)
  ROOT %body_fusion.3 = f32[8,128]{1,0} fusion(%s), kind=kLoop, calls=%fused_computation.1
}

ENTRY %main""",
)


def test_hlo_traffic_all_computations():
    """`computations="all"` must surface while-body fusions (the DDIM scan
    case) that entry-only parsing misses."""
    assert "body_fusion.3" not in hlo_traffic(_HLO_WHILE)
    ops = hlo_traffic(_HLO_WHILE, computations="all")
    bf = ops["body_fusion.3"]
    assert bf.kind == "fusion"
    assert bf.out_bytes == 8 * 128 * 4
    assert bf.in_bytes == 8 * 128 * 4
    # entry ops still present; bookkeeping still excluded
    assert "fusion.1" in ops and "tuple.9" not in ops
    # fusion-INTERNAL instructions do leak into "all" mode (documented);
    # callers intersect with traced names — just assert the known internal
    # is attributable so the contract is visible here
    assert "m" in ops
