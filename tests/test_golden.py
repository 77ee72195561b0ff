"""Golden-image regression: the full pipeline must keep producing the same
radiance, pixel for pixel, across refactors (relMSE — the BASELINE.json
fidelity metric — plus exact sample counting).

The golden was rendered by this framework on the CPU backend (8 spp,
tests/goldens/small_scene_8spp.npz); regenerate with tools in git history if
a deliberate behavior change is made, and say so in the commit message.
"""
import os

import numpy as np

from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.utils.image import rel_mse
from test_render import small_scene, cam, W, H

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens',
                      'small_scene_8spp.npz')


def test_matches_golden(reference_assets):
    z = np.load(GOLDEN)
    scene = small_scene(reference_assets)
    pt = Pathtracer(scene, W, H)
    pt.render(cam(), should_clear=True)
    while pt.sample_idx < int(z['spp']):
        pt.render(cam(), should_clear=False)
    pt.finish()
    got = np.asarray(pt.accumulators_pixel_order()[0])
    want = z['lum']
    assert got.shape == want.shape
    # sample counts must agree exactly
    np.testing.assert_array_equal(got[:, 3], want[:, 3])
    err = rel_mse(got[:, :3], want[:, :3])
    assert err < 1e-6, f'relMSE vs golden = {err}'
