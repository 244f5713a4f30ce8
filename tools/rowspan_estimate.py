"""Estimate pair-count reduction from ellipse-exact per-tile-row x-spans
vs the rectangular AABB span (ROADMAP round-3 idea 1c)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from gsrt.core.config import RenderConfig
from gsrt.scene.catalog import random_cloud

W, H, N = 1920, 1080, 1_000_000
for TW, TH in [(16, 16), (32, 8), (16, 8)]:
    cfg = RenderConfig(width=W, height=H, conic_mode="standard",
                       tile_w=TW, tile_h=TH)
    cloud, camera = random_cloud(N, seed=0, width=W, height=H,
                                 scale_range=(0.004, 0.03))
    # replicate count_pairs_numpy up to spans
    means = np.asarray(cloud.means); cov = np.asarray(cloud.cov3d)
    opacity = np.asarray(cloud.opacity); view = np.asarray(camera.view)
    fx, fy = float(camera.fx), float(camera.fy)
    R, t = view[:3, :3], view[:3, 3]
    p = means @ R.T + t
    z = p[:, 2]; in_front = z > 1e-4
    inv_z = 1.0 / np.where(in_front, z, 1.0)
    px_c = fx * p[:, 0] * inv_z + float(camera.cx)
    py_c = fy * p[:, 1] * inv_z + float(camera.cy)
    j00 = fx * inv_z; j02 = -fx * p[:, 0] * inv_z * inv_z
    j11 = fy * inv_z; j12 = -fy * p[:, 1] * inv_z * inv_z
    t0 = np.stack([j00*R[0,0]+j02*R[2,0], j00*R[0,1]+j02*R[2,1], j00*R[0,2]+j02*R[2,2]], -1)
    t1 = np.stack([j11*R[1,0]+j12*R[2,0], j11*R[1,1]+j12*R[2,1], j11*R[1,2]+j12*R[2,2]], -1)
    sig = np.zeros((N, 3, 3), np.float32)
    sig[:,0,0], sig[:,0,1], sig[:,0,2] = cov[:,0], cov[:,1], cov[:,2]
    sig[:,1,0], sig[:,1,1], sig[:,1,2] = cov[:,1], cov[:,3], cov[:,4]
    sig[:,2,0], sig[:,2,1], sig[:,2,2] = cov[:,2], cov[:,4], cov[:,5]
    u = np.einsum("nij,nj->ni", sig, t0); v = np.einsum("nij,nj->ni", sig, t1)
    a = np.sum(t0*u, -1) + cfg.cov2d_dilation
    b = np.sum(t1*u, -1)
    c = np.sum(t1*v, -1) + cfg.cov2d_dilation
    det = a*c - b*b
    in_front &= det > 1e-12
    dq = np.maximum(det, 1e-12)
    qa, qb, qc = c/dq, -b/dq, a/dq
    qdet = np.maximum(qa*qc - qb*qb, 1e-18)
    g = np.minimum(cfg.g_cutoff, np.maximum(np.log(np.maximum(opacity/cfg.alpha_threshold, 1e-6)), 0.0))
    rx = np.sqrt(np.maximum(2.0*g*qc/qdet, 0.0))
    ry = np.sqrt(np.maximum(2.0*g*qa/qdet, 0.0))
    alive = in_front & (opacity > cfg.alpha_threshold) & (rx > 0) & (ry > 0)
    ntx, nty = -(-W//TW), -(-H//TH)
    x0 = np.clip(np.floor((px_c-rx)/TW), 0, ntx-1)
    x1 = np.clip(np.floor((px_c+rx)/TW), 0, ntx-1)
    y0 = np.clip(np.floor((py_c-ry)/TH), 0, nty-1).astype(np.int64)
    y1 = np.clip(np.floor((py_c+ry)/TH), 0, nty-1).astype(np.int64)
    on = ((px_c+rx >= 0) & (px_c-rx < W) & (py_c+ry >= 0) & (py_c-ry < H))
    alive &= on
    rect = np.where(alive, (x1-x0+1)*(y1-y0+1), 0).sum()

    # ellipse-exact per-row spans (vectorized over rows via offset loop)
    max_rows = int((y1-y0).max())+1
    exact = np.zeros((), np.int64)
    for r in range(max_rows):
        ty = y0 + r
        row_live = alive & (ty <= y1)
        # dy band of tile row ty relative to center
        d0 = ty*TH - py_c
        d1 = (ty+1)*TH - 1 - py_c
        d0c = np.clip(d0, -ry, ry); d1c = np.clip(d1, -ry, ry)
        s0 = np.sqrt(np.maximum(2*g*qa - qdet*d0c*d0c, 0.0))
        s1 = np.sqrt(np.maximum(2*g*qa - qdet*d1c*d1c, 0.0))
        xlo0 = (-qb*d0c - s0)/qa; xlo1 = (-qb*d1c - s1)/qa
        xhi0 = (-qb*d0c + s0)/qa; xhi1 = (-qb*d1c + s1)/qa
        dy_xmin = qb*rx/qc   # dy where x attains -rx
        dy_xmax = -qb*rx/qc
        xmin = np.where((dy_xmin >= d0) & (dy_xmin <= d1), -rx, np.minimum(xlo0, xlo1))
        xmax = np.where((dy_xmax >= d0) & (dy_xmax <= d1), rx, np.maximum(xhi0, xhi1))
        x0r = np.clip(np.floor((px_c+xmin)/TW), 0, ntx-1)
        x1r = np.clip(np.floor((px_c+xmax)/TW), 0, ntx-1)
        exact += np.where(row_live, x1r-x0r+1, 0).astype(np.int64).sum()
    print(f"tile {TW}x{TH}: rect={rect/1e6:.2f}M exact={exact/1e6:.2f}M "
          f"reduction={(1-exact/rect)*100:.1f}%  max_rows={max_rows}")
