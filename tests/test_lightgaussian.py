"""LightGaussian importance pruning: importance-as-VJP + percentile prune."""

import jax.numpy as jnp
import numpy as np

from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.fields.lightgaussian import (
    calculate_v_imp_score,
    importance_render,
    prune_gaussians,
    prune_list,
)
from dogs_tpu.fields.model import init_from_points
from dogs_tpu.raster.tiled import RasterConfig, render_tiled

RASTER = RasterConfig(tile_batch=16, chunk=32)


def test_importance_matches_blend_weight_sum():
    scene = make_scene(n_gaussians=32, n_cams=2, width=48, height=48, seed=21,
                       raster_cfg=RASTER)
    model = init_from_points(
        jnp.asarray(scene.points), jnp.asarray(scene.colors), 64, max_sh_degree=2
    )
    model = model.replace(params=model.params.replace(
        xyz=jnp.pad(scene.gt_params.xyz, ((0, 32), (0, 0))),
        log_scale=jnp.pad(scene.gt_params.log_scale, ((0, 32), (0, 0)), constant_values=-10.0),
        quat=jnp.pad(scene.gt_params.quat, ((0, 32), (0, 0))),
        logit_opacity=jnp.pad(scene.gt_params.logit_opacity, ((0, 32), (0, 0)), constant_values=-10.0),
    ))
    cam = scene.cameras[0]
    imp = np.asarray(importance_render(model, cam, RASTER, active_sh_degree=0))
    # Importance sums to total accumulated alpha over the image.
    out = render_tiled(model.params, cam, RASTER, alive=model.alive, active_sh_degree=0)
    np.testing.assert_allclose(imp.sum(), float(jnp.sum(out.alpha)), rtol=1e-3)
    # Dead padding gets zero importance; at least some gaussians contribute.
    assert (imp[32:] == 0).all()
    assert (imp[:32] > 0).sum() > 10


def test_prune_drops_least_important():
    scene = make_scene(n_gaussians=40, n_cams=3, width=48, height=48, seed=22,
                       raster_cfg=RASTER)
    model = init_from_points(
        jnp.asarray(scene.points), jnp.asarray(scene.colors), 64, max_sh_degree=2
    )
    imp = prune_list(model, scene.cameras[:3], RASTER, active_sh_degree=0)
    scores = calculate_v_imp_score(model, imp, v_pow=0.1)
    before = int(model.num_alive)
    pruned = prune_gaussians(model, 0.5, scores)
    after = int(pruned.num_alive)
    assert after <= before - int(0.5 * (before - 1))
    # Survivors have higher scores than the dropped (by construction).
    s = np.asarray(scores)
    alive_before = np.asarray(model.alive)
    alive_after = np.asarray(pruned.alive)
    dropped = alive_before & ~alive_after
    if dropped.any() and alive_after.any():
        assert s[alive_after].min() >= s[dropped].max() - 1e-6
