"""End-to-end CLI smoke test (subprocess, CPU backend)."""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_headless_render(tmp_path, reference_assets):
    out = os.path.join(tmp_path, 'cli.png')
    state = os.path.join(tmp_path, 'save.txt')
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(__file__))]
                   + os.environ.get('PYTHONPATH', '').split(os.pathsep)))
    r = subprocess.run(
        [sys.executable, '-m', 'cuda_pathtracer_tpu',
         '--scene', f'{reference_assets}/example_scene.chai',
         '--width', '48', '--height', '32', '--spp', '2',
         '--out', out, '--state', state,
         '--asset-dir', reference_assets],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 48, 3)
    assert img.max() > 0
    # the camera state was persisted in the reference format
    assert os.path.exists(state)
    assert len(open(state).read().splitlines()) == 5
    assert 'rendered 48x32 @ 2 spp' in r.stderr
