"""Oracle-independent golden vectors (VERDICT r3 #10 / r4 #10).

The whole parity chain is: TPU pipeline <-> refrender/oracle.py <-> the
reference's WGSL. The oracle is itself a transcription, so these tests
anchor it to constants derived DIRECTLY from the WGSL formulas
(gswt.wgsl:207-258 EWA projection, gswt.wgsl:424-435 fragment +
renderer.rs:118-129 ONE/ONE_MINUS_SRC_ALPHA blend) in float64, with the
derivation done outside this repo's code paths and the results committed
as literals below.

Derivation notes (all `file:line` into /root/reference):
- gswt.wgsl:215  t = view3 * (center - cam_pos)
- gswt.wgsl:220-224  tan clamp at 1.3 * htan_fov
- gswt.wgsl:228-232  J_T via a COLUMN-major mat3x3 constructor: its first
  column is (fx/tz, 0, -fx*tx/tz^2) — i.e. J_T is the transpose of the
  classic 2x3 EWA Jacobian. (Reading the constructor row-major silently
  produces a matrix whose clamp terms cannot reach the used 2x2 block —
  the committed case-3 constants expose exactly that mistake.)
- gswt.wgsl:242  T = transpose(view3) * J_T
- gswt.wgsl:245  cov2d = transpose(T) * Vrk * T
- gswt.wgsl:247-258  eigenvalues via mid +/- radius; diagonalVector =
  normalize((cov01, lambda1 - cov00)); major/minor = min(sqrt(2*lambda),
  1024) * (diag | perp(diag))
- gswt.wgsl:424-435  A = -dot(v_position, v_position), discard A < -4,
  src = (exp(A)*a*rgb, exp(A)*a)
- renderer.rs:118-129  blend ONE / ONE_MINUS_SRC_ALPHA, back-to-front:
  dst' = src + (1 - src.a) * dst
"""

import numpy as np

from gswt_renderer_tpu.refrender.oracle import (
    blend_fragments_np,
    ewa_project_cov_np,
)

# --------------------------------------------------------------------- #
# Case 1 — identity view, on-axis center, diagonal Vrk. Every number is
# checkable by hand: t = (0,0,2); J_T diag = (fx/tz, fy/tz) = (300, 275);
# cov2d = diag(300^2*0.01, 275^2*0.04) = diag(900, 3025);
# lambda = (3025, 900); diagonalVector = (0, 1);
# major = sqrt(2*3025)*(0,1), minor = sqrt(2*900)*(1,-0).
# --------------------------------------------------------------------- #
CASE1 = dict(
    Vrk=np.diag([0.01, 0.04, 0.02]),
    center=[0.0, 0.0, 2.0],
    view3=np.eye(3),
    cam_pos=[0.0, 0.0, 0.0],
    focal=(600.0, 550.0),
    htan=(0.6, 0.4),
    cov=(900.0, 0.0, 3025.0),  # cov2d 00, 01, 11
    lam=(3025.0, 900.0),
    major=(0.0, 77.7817459305),  # sqrt(6050)
    minor=(42.4264068712, -0.0),  # sqrt(1800)
)

# --------------------------------------------------------------------- #
# Case 2 — general pose: view3 = Rx(-15 deg) @ Ry(30 deg), off-axis
# center, full SPD Vrk = L L^T with
#   L = [[0.11, 0, 0], [0.03, 0.09, 0], [-0.02, 0.04, 0.05]],
# negative fy exactly as camera.rs:168-189 builds it. Constants from the
# float64 evaluation of the formulas above.
# --------------------------------------------------------------------- #
_L = np.array([[0.11, 0.0, 0.0], [0.03, 0.09, 0.0], [-0.02, 0.04, 0.05]])
CASE2 = dict(
    Vrk=_L @ _L.T,
    center=[0.7, -0.4, 3.1],
    view3=np.array([
        [0.86602540378443871, 0.0, 0.49999999999999994],
        [-0.12940952255126034, 0.96592582628906831, 0.22414386804201339],
        [-0.4829629131445341, -0.25881904510252074, 0.83651630373780794],
    ]),
    cam_pos=[0.1, 0.2, -0.3],
    focal=(1303.0, -733.0),
    htan=(0.73, 0.414),
    cov=(5174.382041, -390.2806987, 687.0736924),
    lam=(5208.073488, 653.3822457),
    major=(-101.6813544, 8.777764174),
    minor=(3.109059415, 36.01525012),
)

# --------------------------------------------------------------------- #
# Case 3 — the 1.3*htan_fov tan clamp ENGAGES (txtz = 4/2 = 2.0 > 0.78):
# tx clamps to 0.78*2 = 1.56, J_T[2,0] = -600*1.56/4 = -234, so
# cov2d00 = 0.02*(300^2 + 234^2) = 2895.12 (an unclamped evaluation gives
# 2945.0 instead; a row-major misread of the constructor gives 1800).
# --------------------------------------------------------------------- #
CASE3 = dict(
    Vrk=np.diag([0.02, 0.02, 0.02]),
    center=[4.0, 0.1, 2.0],
    view3=np.eye(3),
    cam_pos=[0.0, 0.0, 0.0],
    focal=(600.0, 550.0),
    htan=(0.6, 0.4),
    cov=(2895.12, 64.35, 1516.28125),
    lam=(2898.116683, 1513.284567),
    major=(76.05057994, 3.541561247),
    minor=(2.559158149, -54.9547072),
)


def _check(case):
    cov2d, l1, l2, major, minor = ewa_project_cov_np(
        np.asarray(case["Vrk"], np.float64)[None],
        np.asarray(case["center"], np.float64)[None],
        np.asarray(case["view3"], np.float64),
        np.asarray(case["cam_pos"], np.float64),
        case["focal"],
        case["htan"],
    )
    got_cov = (cov2d[0, 0, 0], cov2d[0, 0, 1], cov2d[0, 1, 1])
    np.testing.assert_allclose(got_cov, case["cov"], rtol=3e-5)
    np.testing.assert_allclose((l1[0], l2[0]), case["lam"], rtol=3e-5)
    np.testing.assert_allclose(major[0], case["major"], rtol=3e-5,
                               atol=1e-6)
    np.testing.assert_allclose(minor[0], case["minor"], rtol=3e-5,
                               atol=1e-6)


def test_ewa_golden_on_axis_hand_checkable():
    _check(CASE1)


def test_ewa_golden_general_pose():
    _check(CASE2)


def test_ewa_golden_fov_clamp_engages():
    _check(CASE3)


def test_fragment_blend_golden():
    """Three fragments at one pixel, front-to-back draw order; expected
    premultiplied RGBA evaluated in float64 from gswt.wgsl:424-435 +
    renderer.rs:118-129:
      frag i: B_i = exp(-|v_i|^2) * a_i; composited back-to-front with
      dst' = src + (1 - src.a) * dst."""
    frags = [
        ((0.5, -0.3), (0.9, 0.2, 0.1), 0.8),
        ((1.1, 0.7), (0.1, 0.8, 0.3), 0.6),
        ((0.0, 0.0), (0.2, 0.3, 0.9), 0.95),
    ]
    golden = (0.5900378733, 0.2609057297, 0.3988967601, 0.9808306296)
    np.testing.assert_allclose(blend_fragments_np(frags), golden, rtol=1e-9)
    # the A < -4 discard: a fragment at |v|^2 > 4 contributes nothing
    frags_far = frags + [((2.5, 0.0), (1.0, 1.0, 1.0), 1.0)]
    np.testing.assert_allclose(
        blend_fragments_np(frags_far), golden, rtol=1e-9
    )
    # order sensitivity: reversing the draw order must CHANGE the pixel
    # (guards against a symmetric-blend mistake)
    rev = blend_fragments_np(list(reversed(frags)))
    assert np.abs(np.asarray(rev) - np.asarray(golden)).max() > 1e-3
