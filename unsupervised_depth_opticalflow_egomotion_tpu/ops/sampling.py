"""Fixed-shape correspondence sampling for the geometric estimators.

The reference's sampler (model_geometry.py:427-470) branches on the number of
non-zero scores per batch item (a device->host sync in the hot loop). Here
both stages are static-shape and fully jittable:

- ``top_ratio_sample``: jnp.top_k of the best ratio*N scores (TPU-native sort)
- ``random_sample``: uniform with-replacement draw from the retained set
  (matching the reference's common path, which samples with replacement via
  torch.randint). The rare fewer-than-num-nonzeros fallback collapses to the
  same with-replacement draw, weighted implicitly by top-k retention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import pixel_grid


def build_matches(flow: jax.Array) -> jax.Array:
    """Flow [B,H,W,2] -> match tensor [B,N,4] of (x1, y1, x2, y2) rows."""
    b, h, w, _ = flow.shape
    flow = flow.astype(jnp.float32)
    grid = jnp.broadcast_to(pixel_grid(h, w, jnp.float32)[None], (b, h, w, 2))
    corres = grid + flow
    return jnp.concatenate([grid, corres], axis=-1).reshape(b, h * w, 4)


def top_ratio_sample(match, depth, scores, ratio: float):
    """Keep the top ``ratio`` fraction of matches by score.

    match: [B,N,4], depth: [B,N,1], scores: [B,N] -> tuple of the same with
    N' = int(ratio*N) (model_geometry.py:427-433).
    """
    n = match.shape[1]
    k = max(int(ratio * n), 1)
    top_scores, idx = jax.lax.top_k(scores, k)  # [B,k]
    sel_match = jnp.take_along_axis(match, idx[..., None], axis=1)
    sel_depth = jnp.take_along_axis(depth, idx[..., None], axis=1)
    return sel_match, sel_depth, top_scores


def random_sample(key, match, depth, num: int):
    """Uniform with-replacement draw of ``num`` matches (model_geometry.py:435-455)."""
    b, n, _ = match.shape
    idx = jax.random.randint(key, (b, num), 0, n)
    sel_match = jnp.take_along_axis(match, idx[..., None], axis=1)
    sel_depth = jnp.take_along_axis(depth, idx[..., None], axis=1)
    return sel_match, sel_depth


def sample_matches(key, flow, depth, scores, ratio: float, num: int):
    """Full two-stage sampler: matches [B,num,4] + their depths [B,num,1].

    flow: [B,H,W,2], depth: [B,H,W,1], scores: [B,H,W,1].
    """
    b, h, w, _ = flow.shape
    match = build_matches(flow)
    depth_flat = depth.reshape(b, h * w, 1)
    score_flat = scores.reshape(b, h * w)
    m, d, s = top_ratio_sample(match, depth_flat, score_flat, ratio)
    return random_sample(key, m, d, num)
