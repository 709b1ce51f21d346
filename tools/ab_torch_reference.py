"""A/B parity harness: this framework vs the reference PyTorch CNMNet.

Instantiates the reference's actual `depthNet` / `DepthRefineNet`
(imported from /root/reference, run on CPU via small shims for the
cuda-pinned tensor constructors), transplants their randomly-initialized
weights into our flax tree with ``tools/import_torch_checkpoint``, and
compares forwards on identical inputs. Four tiers:

  geometry  — our ``plane_sweep_terms`` vs reference
              ``process_camera_parameters`` (`depth_util.py:24-56`)
  volume    — our cost volume vs reference ``getVolume``
              (`depthNet_model.py:185-224`); also run with the torch
              align_corners=True coordinate shrink (u*(W-1)/W) mimicked, to
              show the *only* deviation is that documented convention
  depthnet  — reference forward (volume injected so both sides see the
              identical volume) vs our DepthNet, all four disparity heads
              + iconv1 (`depthNet_model.py:226-263`)
  refinenet — reference DepthRefineNet vs ours on identical inputs
              (`depthNet_model.py:268-370`)
  full      — end-to-end 3-view pipeline, each side building its own cost
              volumes (deviation = sampling convention only)

Usage: python tools/ab_torch_reference.py [--height 64 --width 96]
Prints one line per tier with max|Δ| and a PASS/FAIL verdict; exit 0 iff
all tiers pass.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = os.environ.get("CNMNET_REFERENCE", "/root/reference")


_GRID_SAMPLE_MODE = {"mode": "era"}


def load_reference_nets():
    """Import the reference model module, shimmed for CPU torch.

    Two era shims so the unmodified reference code behaves as it did on its
    pinned stack (CUDA 10.0 / torch 1.2, `README.md` install notes):

    * ``torch.cuda.FloatTensor`` -> CPU constructor
      (`depth_util.py:20,53-54`, `depthNet_model.py:199-206`);
    * ``F.grid_sample`` defaulted to align_corners=True before torch 1.3 —
      modern torch defaults False, which would silently change the oracle.
      The wrapper also supports an "exact" mode that rescales the grid by
      size/(size-1) so the sample lands at exactly pixel u (our sampling
      convention) — used to gate the full-pipeline tier.
    """
    import torch
    import torch.nn.functional as F

    torch.cuda.FloatTensor = torch.FloatTensor  # type: ignore[attr-defined]
    if not getattr(torch.Tensor, "_cpu_device_shim", False):
        # The reference's warp helpers call `.to(depth.get_device())`
        # (`inverse_warp.py:36-41`); on CPU torch get_device() is -1 and
        # `.to(-1)` raises. Treat a negative device index as "stay put".
        _orig_to = torch.Tensor.to

        def _to(self, *args, **kwargs):
            if args and isinstance(args[0], int) and args[0] < 0:
                rest = args[1:]
                return _orig_to(self, *rest, **kwargs) if (rest or kwargs) else self
            return _orig_to(self, *args, **kwargs)

        torch.Tensor.to = _to  # type: ignore[assignment]
        torch.Tensor._cpu_device_shim = True  # type: ignore[attr-defined]
    if not hasattr(F, "_original_grid_sample"):
        F._original_grid_sample = F.grid_sample

        def grid_sample_era(input, grid, **kw):
            kw.setdefault("align_corners", True)
            if _GRID_SAMPLE_MODE["mode"] == "exact":
                # align_corners=True maps normalized n to (n+1)/2*(S-1); the
                # reference normalized with S/2 (n = 2u/S - 1), landing at
                # u*(S-1)/S. To land at exactly u we need
                # (n'+1)/2*(S-1) = (n+1)/2*S, i.e. n' = (n*S + 1)/(S - 1).
                H, W = input.shape[-2], input.shape[-1]
                scale = grid.new_tensor([float(W), float(H)])
                denom = grid.new_tensor([float(W - 1), float(H - 1)])
                grid = (grid * scale + 1.0) / denom
            return F._original_grid_sample(input, grid, **kw)

        F.grid_sample = grid_sample_era
    sys.path.insert(0, REFERENCE_ROOT)
    from depthnet.depthNet_model import DepthRefineNet, depthNet  # noqa: E402

    return depthNet, DepthRefineNet


def _to_torch_nchw(x: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1))).float()


def _from_torch_nchw(t) -> np.ndarray:
    return np.moveaxis(t.detach().numpy(), 1, -1)


def make_inputs(height: int, width: int, seed: int = 0):
    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes

    ds = SyntheticScenes(num_samples=2, height=height, width=width, view_num=3,
                         seed=seed)
    batch = collate([{k: v for k, v in ds[i].items() if k != "index"}
                     for i in range(2)])
    batch["images"] = normalize_images(batch["images"])
    return batch


def tier_geometry(batch):
    """KRKiUV / KT parity (column ordering differs: reference is x-major)."""
    import torch

    load_reference_nets()  # idempotent: installs the CPU/era shims
    sys.path.insert(0, REFERENCE_ROOT)
    from depthnet.depth_util import (  # noqa: E402
        get_pixel_coordinates,
        process_camera_parameters,
    )

    import jax.numpy as jnp

    from cnmnet_tpu.geometry.camera import camera_from_array, plane_sweep_terms

    B, V, H, W, _ = batch["images"].shape
    ref_cam_t = torch.from_numpy(batch["cams"][:, 0]).float()
    src_cam_t = torch.from_numpy(batch["cams"][:, 1]).float()
    pix = get_pixel_coordinates(H, W)
    KRKiUV_t, KT_t = process_camera_parameters(ref_cam_t, src_cam_t, pix)
    # reference columns are x-major ([3, W*H]); ours y-major ([3, H*W])
    KRKiUV_ref = (
        KRKiUV_t.numpy().reshape(B, 3, W, H).transpose(0, 1, 3, 2).reshape(B, 3, -1)
    )

    ref_cam = camera_from_array(jnp.asarray(batch["cams"][:, 0]))
    src_cam = camera_from_array(jnp.asarray(batch["cams"][:, 1]))
    KRKiUV, KT = plane_sweep_terms(ref_cam, src_cam, H, W)

    d1 = float(np.max(np.abs(np.asarray(KRKiUV) - KRKiUV_ref)))
    d2 = float(np.max(np.abs(np.asarray(KT) - KT_t.numpy())))
    return max(d1, d2)


def _reference_volume(depthNet_cls, batch):
    import torch

    load_reference_nets()  # idempotent: installs the CPU/era shims
    B, V, H, W, _ = batch["images"].shape
    torch.manual_seed(0)
    net = depthNet_cls(idepth_scale=3.0)
    net.eval()
    with torch.no_grad():
        ref_t = _to_torch_nchw(batch["images"][:, 0])
        src_t = _to_torch_nchw(batch["images"][:, 1])
        sys.path.insert(0, REFERENCE_ROOT)
        from depthnet.depth_util import (  # noqa: E402
            get_pixel_coordinates,
            process_camera_parameters,
        )

        pix = get_pixel_coordinates(H, W)
        KRKiUV_t, KT_t = process_camera_parameters(
            torch.from_numpy(batch["cams"][:, 0]).float(),
            torch.from_numpy(batch["cams"][:, 1]).float(),
            pix,
        )
        vol_t = net.getVolume(ref_t, src_t, KRKiUV_t, KT_t)  # [B, 64, H, W]
    return net, np.moveaxis(vol_t.numpy(), 1, -1)  # [B, H, W, 64]


def tier_volume(depthNet_cls, batch):
    import jax
    import jax.numpy as jnp

    from cnmnet_tpu.geometry.camera import camera_from_array, plane_sweep_terms
    from cnmnet_tpu.geometry.warp import bilinear_sample
    from cnmnet_tpu.ops.cost_volume import (
        _sweep_coords,
        cost_volume_from_cameras,
        idepth_hypotheses,
    )

    B, V, H, W, _ = batch["images"].shape
    _, vol_ref = _reference_volume(depthNet_cls, batch)

    ref_cam = camera_from_array(jnp.asarray(batch["cams"][:, 0]))
    src_cam = camera_from_array(jnp.asarray(batch["cams"][:, 1]))
    ours = np.asarray(
        cost_volume_from_cameras(
            jnp.asarray(batch["images"][:, 0]), jnp.asarray(batch["images"][:, 1]),
            ref_cam, src_cam, 3.0, 64,
        )
    )
    raw = float(np.max(np.abs(ours - vol_ref)))

    # Mimic torch align_corners=True: grid_sample's [-1,1] normalization with
    # the reference's W/2 scaling lands samples at u*(W-1)/W (documented in
    # geometry/warp.py). With that shrink applied, the volumes must agree to
    # fp epsilon.
    idepths = idepth_hypotheses(3.0, 64)
    KRKiUV, KT = plane_sweep_terms(ref_cam, src_cam, H, W)

    def one(ref_img, src_img, A, t):
        x, y = _sweep_coords(A, t, idepths, H, W)
        xs = x * (W - 1) / W
        ys = y * (H - 1) / H
        warped = jax.vmap(lambda xx, yy: bilinear_sample(src_img, xx, yy))(xs, ys)
        return jnp.sum(jnp.abs(warped - ref_img[None]), -1).transpose(1, 2, 0)

    mimic = np.asarray(
        jax.vmap(one)(
            jnp.asarray(batch["images"][:, 0]), jnp.asarray(batch["images"][:, 1]),
            KRKiUV, KT,
        )
    )
    shrunk = float(np.max(np.abs(mimic - vol_ref)))
    return raw, shrunk


def _import_params(torch_nets, cfg):
    """state_dicts of live torch nets -> our (params, batch_stats)."""
    from tools.import_torch_checkpoint import import_checkpoint

    depth_net, refine_net = torch_nets
    ckpt = {
        "depth_network_state_dict": {
            k: v.detach().numpy() for k, v in depth_net.state_dict().items()
        },
    }
    if refine_net is not None:
        ckpt["depth_refine_network_state_dict"] = {
            k: v.detach().numpy() for k, v in refine_net.state_dict().items()
        }
    return import_checkpoint(ckpt, cfg)


def _our_model(cfg):
    from cnmnet_tpu.train.state import build_model

    return build_model(cfg)


def tier_depthnet(depthNet_cls, batch, cfg):
    """Inject the identical cost volume into both sides; compare the nets."""
    import jax
    import jax.numpy as jnp
    import torch

    net, vol_ref = _reference_volume(depthNet_cls, batch)
    with torch.no_grad():
        vol_t = torch.from_numpy(np.moveaxis(vol_ref, -1, 1).copy())
        net.getVolume = lambda *a, **k: vol_t  # inject
        ref_t = _to_torch_nchw(batch["images"][:, 0])
        src_t = _to_torch_nchw(batch["images"][:, 1])
        cam0 = torch.from_numpy(batch["cams"][:, 0]).float()
        cam1 = torch.from_numpy(batch["cams"][:, 1]).float()
        disps_t, iconv_t = net(ref_t, src_t, cam0, cam1)

    params, stats = _import_params((net, None), cfg)
    model = _our_model(cfg)
    disps, iconv = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(batch["images"][:, 0]),
        jnp.asarray(vol_ref),
        train=False,
        method=lambda m, r, v, train: m.depth_net(r, v, train=train),
    )
    errs = [
        float(np.max(np.abs(np.asarray(d)[..., 0] - t.numpy()[:, 0])))
        for d, t in zip(disps, disps_t)
    ]
    errs.append(float(np.max(np.abs(np.asarray(iconv) - _from_torch_nchw(iconv_t)))))
    return errs


def tier_refinenet(refine_cls, batch, cfg, rng):
    import jax.numpy as jnp
    import torch

    B, V, H, W, _ = batch["images"].shape
    torch.manual_seed(1)
    net = refine_cls(idepth_scale=3.0)
    net.eval()
    idepth01 = (0.1 + 2.8 * rng.random((B, H, W, 1))).astype(np.float32)
    idepth02 = (0.1 + 2.8 * rng.random((B, H, W, 1))).astype(np.float32)
    iconv01 = rng.standard_normal((B, H, W, 64)).astype(np.float32)
    iconv02 = rng.standard_normal((B, H, W, 64)).astype(np.float32)
    with torch.no_grad():
        disp_t, prob_t = net(
            _to_torch_nchw(idepth01), _to_torch_nchw(idepth02),
            _to_torch_nchw(iconv01), _to_torch_nchw(iconv02),
        )

    import torch as _t

    _t.manual_seed(0)
    depth_net = load_reference_nets()[0](idepth_scale=3.0)  # donor for the tree
    params, stats = _import_params((depth_net, net), cfg)
    model = _our_model(cfg)
    disp, prob = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(idepth01), jnp.asarray(idepth02),
        jnp.asarray(iconv01), jnp.asarray(iconv02),
        train=False,
        method=lambda m, a, b, c, d, train: m.refine_net(a, b, c, d, train=train),
    )
    return [
        float(np.max(np.abs(np.asarray(disp)[..., 0] - disp_t.numpy()[:, 0]))),
        float(np.max(np.abs(np.asarray(prob)[..., 0] - prob_t.numpy()[:, 0]))),
    ]


def tier_full(depthNet_cls, refine_cls, batch, cfg):
    """Both sides run their whole 3-view pipeline (own cost volumes)."""
    import jax.numpy as jnp
    import torch

    torch.manual_seed(0)
    dnet = depthNet_cls(idepth_scale=3.0)
    dnet.eval()
    torch.manual_seed(1)
    rnet = refine_cls(idepth_scale=3.0)
    rnet.eval()
    with torch.no_grad():
        ref_t = _to_torch_nchw(batch["images"][:, 0])
        cam0 = torch.from_numpy(batch["cams"][:, 0]).float()
        outs = []
        for v in (1, 2):
            src_t = _to_torch_nchw(batch["images"][:, v])
            camv = torch.from_numpy(batch["cams"][:, v]).float()
            disps_t, iconv_t = dnet(ref_t, src_t, cam0, camv)
            outs.append((disps_t[0], iconv_t))
        disp_ref_t, prob_t = rnet(outs[0][0], outs[1][0], outs[0][1], outs[1][1])

    params, stats = _import_params((dnet, rnet), cfg)
    model = _our_model(cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(batch["images"]), jnp.asarray(batch["cams"]), train=False,
    )
    d_refined = float(
        np.max(np.abs(np.asarray(out.idepth_refined)[..., 0] - disp_ref_t.numpy()[:, 0]))
    )
    d_prob = float(
        np.max(np.abs(np.asarray(out.prob_map)[..., 0] - prob_t.numpy()[:, 0]))
    )
    d_disp1 = float(
        np.max(np.abs(np.asarray(out.disps[0][:, 0, ..., 0]) - outs[0][0].numpy()[:, 0]))
    )
    return [d_disp1, d_refined, d_prob]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    args = p.parse_args(argv)

    from cnmnet_tpu.config import Config

    cfg = Config()
    cfg.dataset.image_height = args.height
    cfg.dataset.image_width = args.width
    cfg.model.num_planes = 64  # the reference hard-codes 64 planes

    depthNet_cls, refine_cls = load_reference_nets()
    batch = make_inputs(args.height, args.width)
    rng = np.random.default_rng(7)

    failures = []

    def report(name, value, tol):
        ok = value <= tol
        print(f"{name:34s} max|d| = {value:.3e}  (tol {tol:.0e})  "
              f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    g = tier_geometry(batch)
    report("geometry: KRKiUV/KT", g, 1e-4)

    raw, shrunk = tier_volume(depthNet_cls, batch)
    # raw deviation = the documented align-corners convention (sub-pixel
    # sample shift, bounded by image gradient * 1px at the border)
    print(f"{'volume: raw (convention delta)':34s} max|d| = {raw:.3e}  (informational)")
    # Residual after mimicking the convention = the epsilon-placement
    # difference (we scale the z-guard by idepth; `depthNet_model.py:212`
    # adds 1e-6 to z directly) — sub-1e-3 on O(1..10) costs.
    report("volume: torch-convention mimic", shrunk, 2e-3)

    errs = tier_depthnet(depthNet_cls, batch, cfg)
    for name, e in zip(["disp1", "disp2", "disp3", "disp4", "iconv1"], errs):
        report(f"depthnet: {name}", e, 5e-4 if name != "iconv1" else 5e-3)

    errs = tier_refinenet(refine_cls, batch, cfg, rng)
    for name, e in zip(["disp_refined", "prob_map"], errs):
        report(f"refinenet: {name}", e, 5e-4)

    # Full pipeline under the era convention: deviation = our documented
    # exact-u sampling vs torch's u*(S-1)/S, amplified by the random nets.
    errs = tier_full(depthNet_cls, refine_cls, batch, cfg)
    print(f"{'full[era]: disp1':34s} max|d| = {errs[0]:.3e}  (informational)")
    print(f"{'full[era]: idepth_refined':34s} max|d| = {errs[1]:.3e}  (informational)")
    print(f"{'full[era]: prob_map':34s} max|d| = {errs[2]:.3e}  (informational)")

    # Full pipeline with the oracle's sampler rescaled to exact-u: every
    # remaining difference is conv/BN/upsample arithmetic — gated.
    _GRID_SAMPLE_MODE["mode"] = "exact"
    try:
        errs = tier_full(depthNet_cls, refine_cls, batch, cfg)
        for name, e in zip(
            ["full[exact]: disp1", "full[exact]: idepth_refined",
             "full[exact]: prob_map"], errs,
        ):
            report(name, e, 5e-3)
    finally:
        _GRID_SAMPLE_MODE["mode"] = "era"

    if failures:
        print("FAILED tiers:", failures)
        return 1
    print("A/B parity: all gated tiers PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
