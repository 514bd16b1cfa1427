"""Observation I/O: load/save tracked-feature data for reconstruction.

The reference only consumes synthetic in-process data; a framework needs a
data path for real tracks. Format: a single ``.npz`` with

- ``x``: (F, P, 2) float — tracked image points per view
- ``visibility``: optional (P, F) bool — which points are seen where
- ``f``: optional (F,) float — focal lengths (affine paraperspective)
- ``f0``: optional scalar — scale constant
- ``X``/``K``/``R``/``t``: optional ground truth / initialization arrays
"""

from __future__ import annotations

from typing import Any

import numpy as np


def save_observations(path: str, x, visibility=None, f=None, f0=None, **extra) -> None:
    data: dict[str, Any] = {"x": np.asarray(x)}
    if visibility is not None:
        data["visibility"] = np.asarray(visibility)
    if f is not None:
        data["f"] = np.asarray(f)
    if f0 is not None:
        data["f0"] = np.asarray(f0)
    for k, v in extra.items():
        data[k] = np.asarray(v)
    np.savez(path, **data)


def load_observations(path: str) -> dict[str, np.ndarray]:
    data = dict(np.load(path, allow_pickle=False))
    if "x" not in data:
        raise ValueError(f"{path} has no 'x' array (expected (F, P, 2) tracks)")
    x = data["x"]
    if x.ndim != 3 or x.shape[-1] != 2:
        raise ValueError(f"'x' must be (F, P, 2), got {x.shape}")
    return data


def load_bal(path: str) -> dict[str, np.ndarray]:
    """Parse a Bundle Adjustment in the Large (BAL) problem file — the
    standard public BA benchmark format (Agarwal et al., "Bundle
    Adjustment in the Large", ECCV 2010): a text file with

        n_cameras n_points n_observations
        <cam_idx pt_idx u v>            x n_observations
        <9 camera params, one per line> x n_cameras
            (Rodrigues rotation, translation, f, k1, k2)
        <3 point coords, one per line>  x n_points

    Returns the framework's dense layout: ``x`` (F, P, 2) with zeros at
    unobserved pairs, ``visibility`` (P, F), and initialization arrays
    ``X`` (P, 3), ``R``/``t``/``K`` (per camera) converted from BAL's
    convention to this framework's:

    - BAL: x_cam = R_bal X + t_bal, pixel = f * d(k1, k2) * (-x_cam.xy /
      x_cam.z) (cameras look down -z). Here: x_cam = R^T (X - t),
      pixel = f * x_cam.xy / (f0 * x_cam.z / f0).
    - Conversion: R = R_bal^T, t = -R_bal^T t_bal, and the observed
      pixels are negated (which absorbs the -z convention exactly; the
      projective depth r is then negative for points in front of a BAL
      camera, which every residual/derivative expression handles —
      only the sign-sensitive cheirality heuristics of the calibration
      stage assume positive depth, and BAL problems come with an
      initialization, so calibration is skipped anyway).
    - The radial distortion (k1, k2) is returned as ``distortion`` (F, 2)
      and is directly consumable by ``bundle_adjust(distortion=...)``
      (``models/bundle_adjustment.py``): the BAL model's s = |rho|^2 is
      sign-invariant and the pixel negation passes through ``d(s) g``
      linearly, so the converted problem optimizes the *exact* BAL
      objective. ``LMConfig.distortion_rounds`` additionally re-estimates
      (k1, k2) by the closed-form per-camera (or ``distortion_shared``)
      refit. Ignoring it (``distortion=None``) reproduces the pinhole
      model, which converges to a distortion-limited error floor.
    """
    with open(path) as fh:
        tokens = fh.read().split()
    it = iter(tokens)
    nf, npts, nobs = int(next(it)), int(next(it)), int(next(it))
    cam_idx = np.empty(nobs, np.int64)
    pt_idx = np.empty(nobs, np.int64)
    uv = np.empty((nobs, 2), np.float64)
    for i in range(nobs):
        cam_idx[i] = int(next(it))
        pt_idx[i] = int(next(it))
        uv[i, 0] = float(next(it))
        uv[i, 1] = float(next(it))
    cams = np.array([float(next(it)) for _ in range(9 * nf)]).reshape(nf, 9)
    pts = np.array([float(next(it)) for _ in range(3 * npts)]).reshape(npts, 3)

    x = np.zeros((nf, npts, 2))
    vis = np.zeros((npts, nf))
    x[cam_idx, pt_idx] = -uv  # negation absorbs BAL's -z projection
    vis[pt_idx, cam_idx] = 1.0

    # Rodrigues -> R_bal, then to this framework's convention.
    w = cams[:, :3]
    theta = np.linalg.norm(w, axis=1, keepdims=True)
    with np.errstate(invalid="ignore"):
        axis = np.where(theta > 0, w / np.where(theta == 0, 1.0, theta), 0.0)
    k_cross = np.zeros((nf, 3, 3))
    k_cross[:, 0, 1] = -axis[:, 2]
    k_cross[:, 0, 2] = axis[:, 1]
    k_cross[:, 1, 0] = axis[:, 2]
    k_cross[:, 1, 2] = -axis[:, 0]
    k_cross[:, 2, 0] = -axis[:, 1]
    k_cross[:, 2, 1] = axis[:, 0]
    st, ct = np.sin(theta)[..., None], np.cos(theta)[..., None]
    r_bal = ct * np.eye(3) + st * k_cross + (1 - ct) * np.einsum(
        "fi,fj->fij", axis, axis
    )
    r = r_bal.transpose(0, 2, 1)
    t = -np.einsum("fji,fj->fi", r_bal, cams[:, 3:6])
    f = cams[:, 6]
    k_mats = np.zeros((nf, 3, 3))
    k_mats[:, 0, 0] = f
    k_mats[:, 1, 1] = f
    k_mats[:, 2, 2] = 1.0
    return {
        "x": x, "visibility": vis, "X": pts, "R": r, "t": t, "K": k_mats,
        "f": f, "distortion": cams[:, 7:9], "f0": np.asarray(1.0),
    }


def save_bal(path: str, x, visibility, X, R, t, f, distortion=None) -> None:
    """Write a BAL-format problem (inverse of :func:`load_bal`'s
    conventions: pixels negated, R/t converted back to world->camera)."""
    x = np.asarray(x)
    vis = np.asarray(visibility)
    nf, npts = x.shape[0], x.shape[1]
    pt_i, cam_i = np.nonzero(vis > 0)
    lines = [f"{nf} {npts} {len(pt_i)}"]
    for p, c in zip(pt_i, cam_i):
        u, v = -x[c, p]
        lines.append(f"{c} {p} {float(u)!r} {float(v)!r}")
    R = np.asarray(R)
    t = np.asarray(t)
    f = np.asarray(f)
    dist = np.zeros((nf, 2)) if distortion is None else np.asarray(distortion)
    for i in range(nf):
        r_bal = R[i].T
        # rotation matrix -> Rodrigues vector
        cos_t = np.clip((np.trace(r_bal) - 1.0) / 2.0, -1.0, 1.0)
        theta = np.arccos(cos_t)
        skew = np.array([
            r_bal[2, 1] - r_bal[1, 2],
            r_bal[0, 2] - r_bal[2, 0],
            r_bal[1, 0] - r_bal[0, 1],
        ])
        if theta < 1e-12:
            w = np.zeros(3)
        elif np.pi - theta < 1e-3:
            # theta ~ pi: skew/(2 sin) is 0/0 — recover the axis from the
            # well-conditioned symmetric part aa^T = (R + R^T)/2 - cos I,
            # scaled by 1/(1 - cos); sign from the residual skew part
            # (at exactly pi, +a and -a encode the same rotation).
            aat = ((r_bal + r_bal.T) / 2.0 - cos_t * np.eye(3)) / (1.0 - cos_t)
            k = int(np.argmax(np.diag(aat)))
            axis = aat[:, k] / np.sqrt(max(aat[k, k], 1e-30))
            axis /= np.linalg.norm(axis)
            if np.dot(skew, axis) < 0:
                axis = -axis
            w = theta * axis
        else:
            w = theta / (2.0 * np.sin(theta)) * skew
        t_bal = -r_bal @ t[i]
        for val in (*w, *t_bal, f[i], *dist[i]):
            lines.append(repr(float(val)))
    for p in np.asarray(X):
        for val in p:
            lines.append(repr(float(val)))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
