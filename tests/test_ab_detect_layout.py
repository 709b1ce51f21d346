"""Differential tests: data/detect.py + data/layout.py vs the reference's
OWN `data_prepare/utils.py` (imported and executed as the oracle, the
`tools/ab_torch_reference.py` pattern — VERDICT r4 item 4).

Two families:

* **parity** — boxes/IoU/refinement/anchors/molding and `getStructures`
  labels must agree exactly (after the documented camera-frame map: ours is
  the standard frame x-right/y-down/z-forward, the reference's is
  x-right/y-forward/z-up, i.e. ``ref = (x, z, -y)`` — a rotation, so every
  dot product, plane depth and relation code is invariant).
* **expected difference** — the two intentional clean-room bug fixes are
  codified as fixtures where the reference's output is asserted to SHOW the
  bug and ours the fix:
    1. mixed-relation structures: the reference emits the whole structure
       (twice, once per majority-graph component seed); we emit the
       connected components (`utils.py:996-1006` vs `layout.py`).
    2. `getLayout` scores combination consistency against a visible map
       built in PRE-sort candidate order while the combination uses
       POST-sort rows (`utils.py:692-724,808`); we use one ordering.

Era shim for the reference module (pinned cv2 of 2019): float ``dsize`` in
``cv2.resize``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from cnmnet_tpu.data import detect, layout  # noqa: E402
from cnmnet_tpu.data.prep import plane_depth_map  # noqa: E402

REFERENCE_ROOT = os.environ.get("CNMNET_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE_ROOT, "data_prepare", "utils.py")),
    reason="reference checkout not available",
)


class _Cv2Shim:
    """cv2 proxy casting float dsize to int — `utils.py:148` passes
    ``shape * scale`` floats, which the reference's 2019 cv2 accepted."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, name):
        return getattr(self._real, name)

    def resize(self, img, dsize, **kw):
        return self._real.resize(
            img, (int(round(dsize[0])), int(round(dsize[1]))), **kw
        )


@pytest.fixture(scope="module")
def ref_utils():
    # numpy 2.0 restored `np.bool` (as np.bool_) — `utils.py:996` works as-is
    assert np.bool is np.bool_
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "data_prepare"))
    try:
        import utils as ru
    finally:
        sys.path.pop(0)
    ru.cv2 = _Cv2Shim(cv2)
    return ru


# ---------------------------------------------------------------------------
# camera-frame map: ours (x right, y down, z forward) <-> reference
# (x right, y forward/depth, z up)
# ---------------------------------------------------------------------------


def to_ref_frame(vec):
    v = np.asarray(vec, dtype=np.float64)
    return np.stack([v[..., 0], v[..., 2], -v[..., 1]], axis=-1)


FX, FY, CX, CY = 32.0, 32.0, 32.0, 24.0
H, W = 48, 64
K_INV = np.linalg.inv(
    np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]], dtype=np.float64)
)
CAMERA = [FX, FY, CX, CY, W, H]  # identity u/v remap in calcPlaneDepths


def render_scene(planes):
    """Per-pixel argmin-depth render of plane params (our frame): returns
    (depth [H, W], segmentation [H, W] of the nearest positive plane)."""
    pd = plane_depth_map(np.asarray(planes, dtype=np.float64), K_INV, H, W)
    pd = np.where(pd > 1e-4, pd, np.inf)
    seg = pd.argmin(axis=0).astype(np.int32)
    depth = pd.min(axis=0)
    seg[~np.isfinite(depth)] = -1
    depth[~np.isfinite(depth)] = 0.0
    return depth, seg


# ---------------------------------------------------------------------------
# detect.py parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def inst_masks():
    rng = np.random.default_rng(3)
    masks = np.zeros((H, W, 5), dtype=np.uint8)
    masks[4:20, 6:30, 0] = 1
    masks[10:40, 25:60, 1] = 1
    masks[30:31, 50:52, 2] = 1  # near-degenerate 1x2 instance
    masks[:, :, 3] = (rng.random((H, W)) < 0.2).astype(np.uint8)
    # channel 4 stays empty: both sides must emit an all-zero box
    return masks


def test_boxes_match_reference(ref_utils, inst_masks):
    ours = detect.masks_to_boxes(inst_masks)
    ref = ref_utils.extract_bboxes(inst_masks)
    np.testing.assert_array_equal(ours, ref)


def test_iou_matrix_matches_reference(ref_utils, inst_masks):
    boxes = detect.masks_to_boxes(inst_masks).astype(np.float64)
    rng = np.random.default_rng(7)
    others = np.sort(rng.integers(0, 48, size=(6, 4)), axis=-1)[
        :, [0, 2, 1, 3]
    ].astype(np.float64)
    ours = detect.pairwise_iou(boxes, others)
    ref = ref_utils.compute_overlaps(boxes, others)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_box_refinement_matches_reference(ref_utils, inst_masks):
    boxes = detect.masks_to_boxes(inst_masks)[:2].astype(np.float64)
    gt = boxes + np.array([[1.0, -2.0, 3.0, 2.0], [0.5, 0.5, -1.0, 4.0]])
    ours = detect.box_refinement(boxes, gt)
    ref = ref_utils.box_refinement(
        torch.from_numpy(boxes), torch.from_numpy(gt)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_pyramid_anchors_match_reference(ref_utils):
    scales = [8, 16, 32]
    ratios = [0.5, 1.0, 2.0]
    shapes = [(8, 8), (4, 4), (2, 2)]
    strides = [8, 16, 32]
    ours = detect.generate_pyramid_anchors(scales, ratios, shapes, strides)
    ref = ref_utils.generate_pyramid_anchors(scales, ratios, shapes, strides, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-9)


def test_resize_image_padding_convention_matches_reference(ref_utils):
    """Molded shape is min_dim x max_dim (NOT a square) — ADVICE r4."""
    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3) % 251
    # scale == 1 case isolates the padding convention from interpolation
    ours, win_o, scale_o, pad_o = detect.resize_image(
        img, min_dim=20, max_dim=40, padding=True
    )
    ref, win_r, scale_r, pad_r = ref_utils.resize_image(
        img, min_dim=20, max_dim=40, padding=True
    )
    assert ours.shape == ref.shape == (20, 40, 3)
    assert tuple(win_o) == tuple(win_r)
    assert scale_o == scale_r == 1
    np.testing.assert_array_equal(ours, np.asarray(ref))
    # scaled case: conventions (shape/window/scale/pad) must agree even
    # where interpolated pixel values differ (cv2 vs our bilinear)
    ours, win_o, scale_o, pad_o = detect.resize_image(
        img.astype(np.float64), min_dim=40, max_dim=64, padding=True
    )
    ref, win_r, scale_r, pad_r = ref_utils.resize_image(
        img.astype(np.float64), min_dim=40, max_dim=64, padding=True
    )
    assert ours.shape == ref.shape
    assert tuple(win_o) == tuple(win_r)
    assert scale_o == pytest.approx(scale_r)
    assert [tuple(p) for p in pad_o[:2]] == [tuple(p) for p in pad_r[:2]]


def test_minimize_mask_and_depth_match_reference(ref_utils, inst_masks):
    masks = inst_masks[:, :, :2]
    boxes = detect.masks_to_boxes(masks)
    ours = detect.minimize_mask(boxes, masks, (14, 14))
    ref = ref_utils.minimize_mask(boxes, masks, (14, 14))
    # both threshold a bilinear resize at 0.5; solid rectangles are exact
    assert ours.shape == ref.shape
    assert (ours[:, :, 0] == ref[:, :, 0]).all()

    depth = np.zeros((H, W), dtype=np.float32)
    depth[:, : W // 2] = 2.0
    depth[:, W // 2 :] = 5.0  # discontinuity: NEAREST must not blend it
    md_ours = detect.minimize_depth(boxes, depth, (14, 14))
    md_ref = ref_utils.minimize_depth(boxes, depth, (14, 14))
    assert set(np.unique(md_ours)) <= {2.0, 5.0}
    assert set(np.unique(md_ref)) <= {2.0, 5.0}
    # identical nearest-neighbor index maps up to cv2's half-pixel origin:
    # values must agree away from the single discontinuity column
    disagree = (md_ours != md_ref).mean()
    assert disagree < 0.15


# ---------------------------------------------------------------------------
# getStructures parity
# ---------------------------------------------------------------------------


def _ref_structures(ref_utils, planes, plane_info, seg, depth):
    return ref_utils.getStructures(
        None, to_ref_frame(planes), plane_info, seg, depth, CAMERA
    )


def _map_params(p):
    """Our param vector(s) -> reference frame, flattened."""
    return to_ref_frame(np.asarray(p, dtype=np.float64).reshape(-1, 3)).reshape(-1)


def _compare_structures(ours, ref):
    def key_of(flat):
        return tuple(np.round(np.asarray(flat, dtype=np.float64), 9))

    assert set(ours.keys()) == set(ref.keys())
    for label in ours:
        assert len(ours[label]) == len(ref[label]), label
        ours_sorted = sorted(ours[label], key=lambda t: key_of(_map_params(t[0])))
        ref_sorted = sorted(
            ref[label],
            key=lambda t: key_of(np.asarray(t[0], dtype=np.float64).reshape(-1)),
        )
        for (po, mo), (pr, mr) in zip(ours_sorted, ref_sorted):
            np.testing.assert_allclose(
                _map_params(po),
                np.asarray(pr, dtype=np.float64).reshape(-1),
                rtol=1e-9,
                atol=1e-12,
            )
            np.testing.assert_array_equal(np.asarray(mo), np.asarray(mr))


def test_structures_two_plane_convex_parity(ref_utils):
    planes = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 4.0]])  # floor + back wall
    depth, seg = render_scene(planes)
    plane_info = [[(0, 3), (7, None)], [(1, 1), (7, None)]]
    ours = layout.group_structures(planes, plane_info, seg, depth, K_INV)
    ref = _ref_structures(ref_utils, planes, plane_info, seg, depth)
    assert set(ours.keys()) == {1}  # one 2-plane convex structure
    _compare_structures(ours, ref)


def test_structures_three_plane_parity_horizontal_first(ref_utils):
    # floor + back wall + left wall: 3-plane convex structure, label 3;
    # the most-horizontal plane (the floor) must be ordered FIRST on both
    # sides — this pins the ADVICE r4 axis fix (ours abs(p[1]) in y-down
    # == reference abs(p_ref[2]) in z-up, `utils.py:1068-1071`).
    planes = np.array(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 4.0], [-2.0, 0.0, 0.0]]
    )
    depth, seg = render_scene(planes)
    plane_info = [
        [(0, 3), (9, None)],
        [(1, 1), (9, None)],
        [(2, 1), (9, None)],
    ]
    ours = layout.group_structures(planes, plane_info, seg, depth, K_INV)
    ref = _ref_structures(ref_utils, planes, plane_info, seg, depth)
    assert set(ours.keys()) == {3}
    _compare_structures(ours, ref)
    params = ours[3][0][0].reshape(3, 3)
    np.testing.assert_allclose(params[0], planes[0])  # floor first


def test_structures_individual_and_parallel_parity(ref_utils):
    # floor + ceiling share a structure but are parallel (no relation) ->
    # both demote to individual planes (label 0); a third membership-free
    # plane is individual from the start.
    planes = np.array(
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 4.0]]
    )
    depth, seg = render_scene(planes)
    plane_info = [
        [(0, 3), (5, None)],
        [(1, 4), (5, None)],
        [(2, 1)],
    ]
    ours = layout.group_structures(planes, plane_info, seg, depth, K_INV)
    ref = _ref_structures(ref_utils, planes, plane_info, seg, depth)
    assert set(ours.keys()) == {0} and len(ours[0]) == 3
    _compare_structures(ours, ref)


def test_structures_mixed_relations_expected_difference(ref_utils):
    """Codified bug-fix delta #1: a mixed-relation structure whose majority
    graph covers only a SUBSET of the members. The reference appends the
    WHOLE member set per component (`utils.py:996-1006`), which then fails
    the whole-set depth-envelope validation and demotes everything to
    individual planes; we emit the connected component itself, which
    validates and survives as a real 2-plane structure."""
    # Three planes sharing one annotated structure: A floor (y=1), B back
    # wall (z=4), C near wall (z=2). B || C (no relation); A-B convex
    # (both anchors on the camera side); A-C concave (C's hand-placed
    # anchor sits BELOW the floor plane, y=1.25 > 1). Majority tie ->
    # target concave -> component {A, C}; B is left over as individual.
    # Masks are hand-placed; observed depth on each mask is the plane's
    # own analytic depth, so anchors lie exactly ON their planes.
    planes = np.array(
        [
            [0.0, 1.0, 0.0],  # A floor y=1
            [0.0, 0.0, 4.0],  # B back wall z=4
            [0.0, 0.0, 2.0],  # C near wall z=2
        ]
    )
    pd = plane_depth_map(planes, K_INV, H, W)
    seg = np.full((H, W), -1, dtype=np.int32)
    seg[33:40, :] = 0  # A: anchor v=36 -> depth 32/12=2.67, y=1
    seg[20:29, :] = 1  # B: anchor v=24 -> y=0, z=4
    seg[41:48, :] = 2  # C: anchor v=44 -> y=(44-24)/32*2=1.25, z=2
    depth = np.zeros((H, W))
    for i in range(3):
        depth[seg == i] = pd[i][seg == i]

    # fixture premise: mixed relations, majority graph = the single edge
    # A-C (tie 1 convex / 1 concave -> target concave)
    anchors = layout._anchor_points(range(3), seg, depth, K_INV)
    rel = layout.pairwise_plane_relations(planes, anchors)
    assert rel[0, 1] == layout.REL_CONVEX
    assert rel[0, 2] == layout.REL_CONCAVE
    assert rel[1, 2] == layout.REL_NONE  # parallel walls

    plane_info = [[(i, 1), (11, None)] for i in range(3)]
    ours = layout.group_structures(planes, plane_info, seg, depth, K_INV)
    ref = _ref_structures(ref_utils, planes, plane_info, seg, depth)

    # ours: the concave component {A, C} survives its envelope check
    # (max(plane depths) == observed on the union exactly); B individual
    assert sorted(ours.keys()) == [0, 2]
    assert len(ours[2]) == 1 and len(ours[0]) == 1
    got = sorted(map(tuple, ours[2][0][0].reshape(2, 3)))
    assert got == sorted((tuple(planes[0]), tuple(planes[2])))
    np.testing.assert_allclose(ours[0][0][0], planes[1])
    # reference: emits the WHOLE {A,B,C} set as one concave structure,
    # whose 3-plane max-envelope contradicts B's observed wall on >20% of
    # the union -> everything demoted to label 0 (B twice: once from the
    # failed structure, once as the mixed-branch leftover) and the real
    # (A, C) structure is lost — the documented defect
    assert set(ref.keys()) == {0}
    assert len(ref[0]) == 4


# ---------------------------------------------------------------------------
# getLayout parity + the consistency-ordering expected difference
# ---------------------------------------------------------------------------


def _run_layouts(ref_utils, planes, plane_labels, layout_labels, seg, depth):
    ours_layout, ours_bounds = layout.extract_layout(
        planes, depth, seg, K_INV, plane_labels, layout_labels
    )
    pd_ref = ref_utils.calcPlaneDepths(
        to_ref_frame(planes), W, H, CAMERA, max_depth=-1
    ).transpose(2, 0, 1)
    plane_info = [[(i, int(l))] for i, l in enumerate(plane_labels)]
    ref_layout, ref_bounds = ref_utils.getLayout(
        to_ref_frame(planes),
        depth,
        pd_ref,
        plane_info,
        seg,
        CAMERA,
        layout_labels={int(l): True for l in layout_labels},
        return_segmentation=True,
        get_boundary=True,
    )
    return ours_layout, ours_bounds, ref_layout, ref_bounds


def test_layout_room_parity(ref_utils):
    """Floor + back wall + ceiling room: candidate areas are already in
    descending order, so the reference's pre/post-sort index mixup is
    inert and the two implementations must agree exactly."""
    planes = np.array(
        [[0.0, 0.0, 4.0], [0.0, -1.0, 0.0], [0.0, 1.0, 0.0]]
    )  # wall (largest rendered area), ceiling, floor — descending
    depth, seg = render_scene(planes)
    areas = [int((seg == i).sum()) for i in range(3)]
    assert areas == sorted(areas, reverse=True)  # premise: sort is a no-op
    ours_layout, ours_bounds, ref_layout, ref_bounds = _run_layouts(
        ref_utils, planes, [1, 4, 3], [1, 3, 4], seg, depth
    )
    np.testing.assert_array_equal(ours_layout, np.asarray(ref_layout))
    assert set(ours_layout.ravel()) == {0, 1, 2}
    # boundaries: same pairs and relation codes; masks agree away from the
    # image border (cv2 morphology border handling differs from our
    # edge-replicate pad)
    ref_keys = {tuple(sorted(map(int, k))): v for k, v in ref_bounds.items()}
    assert set(ours_bounds.keys()) == set(ref_keys.keys())
    for k, (mask_o, rel_o) in ours_bounds.items():
        mask_r, rel_r = ref_keys[k]
        assert rel_o == int(rel_r)
        np.testing.assert_array_equal(
            mask_o[1:-1, 1:-1], np.asarray(mask_r, dtype=bool)[1:-1, 1:-1]
        )


def test_layout_consistency_ordering_expected_difference(ref_utils):
    """Codified bug-fix delta #2: when the area sort REORDERS candidates,
    the reference scores combination consistency against a visible map
    whose indices are in pre-sort order (`utils.py:692-705` builds it
    during enumeration, `utils.py:807-808` compares post-sort rows), so a
    perfectly consistent layout is rejected and it falls back to the
    largest-plane fill. Ours finds the layout."""
    # enumeration order floor, wall: wall has the LARGER area -> sorted
    # candidate order (wall, floor) != enumeration order (floor, wall)
    planes = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 4.0]])
    depth, seg = render_scene(planes)
    a_floor, a_wall = (seg == 0).sum(), (seg == 1).sum()
    assert a_wall > a_floor  # premise: the sort swaps them
    ours_layout, ours_bounds, ref_layout, ref_bounds = _run_layouts(
        ref_utils, planes, [3, 1], [1, 3], seg, depth
    )
    # ours: the floor/wall hull is found, boundary classified convex
    # (the single row where floor and wall depths tie exactly may resolve
    # to either plane depending on candidate order — exclude it)
    agree = (ours_layout == seg).mean()
    assert agree > 0.97, agree
    assert ours_bounds and ours_bounds[(0, 1)][1] == layout.REL_CONVEX
    # reference: the index mixup flips the visible map's labels, the
    # consistency test fails, and the fallback paints everything with the
    # largest candidate (the wall, original index 1) — no boundaries
    ref_layout = np.asarray(ref_layout)
    assert ref_bounds == {}
    assert (ref_layout == 1).all()
    assert not np.array_equal(ref_layout, seg)
