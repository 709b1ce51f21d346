"""Detection-prep + room-layout utilities (SURVEY §2.20 tail:
`data_prepare/utils.py:21-293` and `:687-1086` equivalents)."""

import numpy as np
import pytest

from cnmnet_tpu.data import detect
from cnmnet_tpu.data import layout as layout_mod
from cnmnet_tpu.data.prep import plane_depth_map


# ---------------------------------------------------------------------------
# boxes / anchors / masks
# ---------------------------------------------------------------------------


def _naive_boxes(masks):
    out = np.zeros((masks.shape[-1], 4), dtype=np.int32)
    for i in range(masks.shape[-1]):
        ys, xs = np.nonzero(masks[:, :, i])
        if len(ys):
            out[i] = [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
    return out


def test_masks_to_boxes_matches_naive_and_handles_empty():
    rng = np.random.default_rng(0)
    masks = np.zeros((17, 23, 5), dtype=np.uint8)
    for i in range(4):
        y1, x1 = rng.integers(0, 10, 2)
        h, w = rng.integers(2, 7, 2)
        masks[y1 : y1 + h, x1 : x1 + w, i] = 1
    # instance 4 stays empty
    got = detect.masks_to_boxes(masks)
    np.testing.assert_array_equal(got, _naive_boxes(masks))
    np.testing.assert_array_equal(got[4], 0)


def test_pairwise_iou_values():
    a = np.array([[0, 0, 10, 10], [0, 0, 4, 4]], dtype=np.float64)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 22, 22]], np.float64)
    iou = detect.pairwise_iou(a, b)
    assert iou.shape == (2, 3)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(25.0 / 175.0)
    assert iou[0, 2] == 0.0
    assert iou[1, 1] == 0.0


def test_box_refinement_roundtrip():
    rng = np.random.default_rng(1)
    y1x1 = rng.uniform(0, 50, (8, 2))
    hw = rng.uniform(5, 40, (8, 2))
    boxes = np.concatenate([y1x1, y1x1 + hw], axis=-1)
    gt = boxes + rng.uniform(-3, 3, boxes.shape)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1.0)
    deltas = detect.box_refinement(boxes, gt)
    np.testing.assert_allclose(detect.apply_box_deltas(boxes, deltas), gt, atol=1e-9)


def test_non_max_suppression():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], dtype=np.float64
    )
    keep = detect.non_max_suppression(boxes, np.array([0.9, 0.8, 0.7]), 0.3)
    assert keep.tolist() == [0, 2]


def test_generate_anchors_geometry():
    anchors = detect.generate_anchors(
        scales=8.0, ratios=[0.5, 1.0, 2.0], feature_shape=(4, 5), feature_stride=16
    )
    assert anchors.shape == (4 * 5 * 3, 4)
    # Every anchor is centered on its feature cell...
    cy = (anchors[:, 0] + anchors[:, 2]) / 2
    cx = (anchors[:, 1] + anchors[:, 3]) / 2
    assert set(np.round(cy).astype(int)) <= {0, 16, 32, 48}
    assert set(np.round(cx).astype(int)) <= {0, 16, 32, 48, 64}
    # ...with area scale^2 and the requested aspect ratios.
    h = anchors[:, 2] - anchors[:, 0]
    w = anchors[:, 3] - anchors[:, 1]
    np.testing.assert_allclose(h * w, 64.0, rtol=1e-12)
    assert set(np.round(w / h, 3)) == {0.5, 1.0, 2.0}

    pyr = detect.generate_pyramid_anchors(
        [8, 16], [1.0], [(4, 4), (2, 2)], [16, 32]
    )
    assert pyr.shape == (16 + 4, 4)


def test_resize_image_and_mask_molding():
    img = np.arange(20 * 30 * 3, dtype=np.float64).reshape(20, 30, 3)
    out, window, scale, pad = detect.resize_image(
        img, min_dim=40, max_dim=64, padding=True
    )
    # reference pads height to min_dim, width to max_dim -> 40x64 molded
    # image (NOT a max_dim square), e.g. 480x640 for ScanNet sensors
    assert out.shape[:2] == (40, 64)
    assert scale == pytest.approx(2.0)
    y1, x1, y2, x2 = window
    assert (y2 - y1, x2 - x1) == (40, 60)
    assert np.all(out[:, : window[1]] == 0)

    mask = np.zeros((20, 30, 1), dtype=np.uint8)
    mask[5:10, 5:15, 0] = 1
    rm = detect.resize_mask(mask, scale, pad)
    assert rm.shape == (40, 64, 1)
    assert rm.sum() == pytest.approx(mask.sum() * 4, rel=0.15)


def test_minimize_expand_mask_roundtrip():
    mask = np.zeros((48, 64, 1), dtype=np.uint8)
    mask[10:30, 20:52, 0] = 1
    boxes = detect.masks_to_boxes(mask)
    mini = detect.minimize_mask(boxes, mask, (16, 16))
    assert mini.shape == (16, 16, 1)
    assert mini.all()  # a solid rectangle stays solid
    back = detect.expand_mask(boxes[0], mini[:, :, 0], (48, 64))
    inter = (back & (mask[:, :, 0] != 0)).sum()
    union = (back | (mask[:, :, 0] != 0)).sum()
    assert inter / union > 0.95

    depth = np.full((48, 64), 2.5)
    mini_d = detect.minimize_depth(boxes, depth, (8, 8))
    np.testing.assert_allclose(mini_d, 2.5)


def test_image_meta_and_molding_roundtrip():
    meta = detect.compose_image_meta(7, (48, 64, 3), (0, 0, 48, 64), [1, 0, 1])
    parsed = detect.parse_image_meta(meta)
    assert parsed["image_id"][0] == 7
    np.testing.assert_array_equal(parsed["window"][0], [0, 0, 48, 64])
    np.testing.assert_array_equal(parsed["active_class_ids"][0], [1, 0, 1])

    img = np.random.default_rng(2).integers(0, 255, (8, 8, 3)).astype(np.float32)
    mean = [123.7, 116.8, 103.9]
    np.testing.assert_array_equal(
        detect.unmold_image(detect.mold_image(img, mean), mean), img.astype(np.uint8)
    )


# ---------------------------------------------------------------------------
# room layout
# ---------------------------------------------------------------------------

H, W = 96, 128
K = np.array([[100.0, 0.0, 64.0], [0.0, 100.0, 48.0], [0.0, 0.0, 1.0]])
K_INV = np.linalg.inv(K)


def _tie_mask(planes):
    """Pixels where the two nearest POSITIVE plane depths exactly tie
    (argmin order is implementation-defined there)."""
    pd = plane_depth_map(planes, K_INV, H, W)
    pd = np.sort(np.where(pd > 1e-4, pd, np.inf), axis=0)
    return np.isfinite(pd[1]) & (pd[1] - pd[0] < 1e-9)


def _room(with_object=False):
    """Camera inside a room corner: floor (y=+1.5), back wall (z=4),
    left wall (x=-2). Returns (planes, labels, depth, segmentation)."""
    planes = np.array(
        [
            [0.0, 1.5, 0.0],  # floor: n=(0,1,0) d=1.5 (camera y points down)
            [0.0, 0.0, 4.0],  # back wall: n=(0,0,1) d=4
            [-2.0, 0.0, 0.0],  # left wall: n=(-1,0,0) d=2
        ]
    )
    labels = [1, 2, 2]  # 1=floor, 2=wall
    pd = plane_depth_map(planes, K_INV, H, W)
    pd_pos = np.where(pd > 1e-4, pd, np.inf)
    seg = pd_pos.argmin(axis=0).astype(np.int64)
    depth = pd_pos.min(axis=0)
    assert np.isfinite(depth).all()
    if with_object:
        # a small fronto-parallel object at z=1 occluding ~1% of the image
        obj = np.array([[0.0, 0.0, 1.0]])
        planes = np.concatenate([planes, obj])
        labels = labels + [0]
        obj_mask = np.zeros((H, W), dtype=bool)
        obj_mask[40:50, 60:72] = True
        closer = obj_mask & (1.0 < depth)
        depth = np.where(closer, 1.0, depth)
        seg = np.where(closer, 3, seg)
    return planes, labels, depth, seg


def test_extract_layout_recovers_room_hull():
    planes, labels, depth, seg = _room()
    layout, boundaries = layout_mod.extract_layout(
        planes, depth, seg, K_INV, labels, layout_labels={1, 2}
    )
    # bit-equal away from exact plane-depth ties (argmin order differs there)
    tie = _tie_mask(planes)  # the projected corner seams
    assert tie.mean() < 0.02
    np.testing.assert_array_equal(layout[~tie], seg[~tie])
    # three mutually non-parallel hull planes -> three boundary bands,
    # all with the mutually-behind relation (nearest-plane partition)
    assert set(boundaries) == {(0, 1), (0, 2), (1, 2)}
    for band, rel in boundaries.values():
        assert rel == layout_mod.REL_CONVEX
        assert band.any() and not band.all()
    # boundary bands hug the actual segmentation transitions
    for (i, j), (band, _) in boundaries.items():
        edge = (seg == i) & ~band
        assert edge.any()


def test_extract_layout_sees_through_small_occluder():
    planes, labels, depth, seg = _room(with_object=True)
    layout, boundaries = layout_mod.extract_layout(
        planes, depth, seg, K_INV, labels, layout_labels={1, 2}
    )
    assert boundaries  # full hull still found
    # the occluded region is explained by the hull plane behind the object
    obj = seg == 3
    assert obj.any()
    assert (layout[obj] != 3).all() and (layout[obj] >= 0).all()
    keep = ~obj & ~_tie_mask(planes[:3])
    np.testing.assert_array_equal(layout[keep], seg[keep])


def test_extract_layout_fallback_single_plane():
    planes, labels, depth, seg = _room()
    # only the floor is layout-labeled -> no >=2-plane combination exists
    layout, boundaries = layout_mod.extract_layout(
        planes, depth, seg, K_INV, labels, layout_labels={1}
    )
    assert boundaries == {}
    # everywhere the floor has positive analytic depth it is the layout
    pd = plane_depth_map(planes, K_INV, H, W)
    np.testing.assert_array_equal(layout == 0, pd[0] > 1e-4)


def test_extract_layout_no_candidates():
    planes, labels, depth, seg = _room()
    layout, boundaries = layout_mod.extract_layout(
        planes, depth, seg, K_INV, labels, layout_labels={9}
    )
    assert boundaries == {}
    assert (layout == -1).all()


def test_pairwise_plane_relations_codes():
    # two faces of the room corner: mutually behind each other -> REL_CONVEX
    planes = np.array([[0.0, 0.0, 4.0], [-2.0, 0.0, 0.0]])
    anchors = np.array([[0.0, 0.0, 4.0], [-2.0, 0.0, 2.0]])
    rel = layout_mod.pairwise_plane_relations(planes, anchors)
    assert rel[0, 1] == rel[1, 0] == layout_mod.REL_CONVEX
    # near-parallel pair -> REL_NONE
    planes = np.array([[0.0, 0.0, 4.0], [0.0, 0.1, 5.0]])
    anchors = np.array([[0.0, 0.0, 4.0], [0.0, 0.0, 5.0]])
    assert layout_mod.pairwise_plane_relations(planes, anchors)[0, 1] == 0
    # a box corner seen from outside (faces z=2 / x=1 of a box occupying
    # x >= 1, z >= 2): each visible anchor lies BEYOND the other plane
    planes = np.array([[0.0, 0.0, 2.0], [1.0, 0.0, 0.0]])
    anchors = np.array([[2.0, 0.0, 2.0], [1.0, 0.0, 3.0]])
    assert (
        layout_mod.pairwise_plane_relations(planes, anchors)[0, 1]
        == layout_mod.REL_CONCAVE
    )


def test_group_structures_labels_and_validation():
    planes, _, depth, seg = _room()
    # back wall + left wall share structure 5; the floor is individual
    plane_info = [
        [(0, 1)],
        [(1, 2), (5,)],
        [(2, 2), (5,)],
    ]
    out = layout_mod.group_structures(planes, plane_info, seg, depth, K_INV)
    assert set(out) == {0, 1}  # individuals + one 2-plane convex structure
    assert len(out[0]) == 1
    params0, mask0 = out[0][0]
    np.testing.assert_array_equal(params0, planes[0])
    np.testing.assert_array_equal(mask0, seg == 0)
    (params, union) = out[1][0]
    assert params.shape == (6,)
    np.testing.assert_array_equal(union, (seg == 1) | (seg == 2))
    # params are the two wall planes, sorted by first coordinate
    np.testing.assert_array_equal(params[:3], planes[2])
    np.testing.assert_array_equal(params[3:], planes[1])


def test_group_structures_rejects_depth_inconsistent_structure():
    planes, _, depth, seg = _room()
    # claim the walls form a structure but corrupt the observed depth
    plane_info = [[(0, 1)], [(1, 2), (5,)], [(2, 2), (5,)]]
    bad_depth = depth + np.where((seg == 1) | (seg == 2), 1.0, 0.0)
    out = layout_mod.group_structures(planes, plane_info, seg, bad_depth, K_INV)
    # structure demoted: every plane comes back as an individual
    assert set(out) == {0}
    assert len(out[0]) == 3
