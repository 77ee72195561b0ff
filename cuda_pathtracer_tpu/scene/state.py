"""Camera state persistence — exact save.txt format parity.

The reference round-trips eye/viewDir/d/focalLength/aperture through a
pipe-separated save.txt (src/stateLoader.h:30-75); files written by the CUDA
build load here unchanged and vice versa.
"""
from __future__ import annotations

import os

from ..core.camera import Camera, default_camera


def save_state(camera: Camera, path: str = 'save.txt') -> None:
    """src/stateLoader.h:35-49."""
    eye = [float(x) for x in camera.eye]
    view = [float(x) for x in camera.view_dir]
    with open(path, 'w') as f:
        f.write(f'{_fmt(eye[0])}|{_fmt(eye[1])}|{_fmt(eye[2])}\n')
        f.write(f'{_fmt(view[0])}|{_fmt(view[1])}|{_fmt(view[2])}\n')
        f.write(f'{_fmt(float(camera.d))}\n')
        f.write(f'{_fmt(float(camera.focal_length))}\n')
        f.write(f'{_fmt(float(camera.aperture))}\n')


def _fmt(x: float) -> str:
    """C++ ostream default formatting (6 significant digits)."""
    return f'{x:.6g}'


def _parse_float3(line: str):
    return [float(p) for p in line.strip().split('|')]


def read_state(path: str = 'save.txt') -> Camera:
    """src/stateLoader.h:51-75 — falls back to the default camera."""
    if not os.path.exists(path):
        return default_camera()
    try:
        with open(path) as f:
            lines = f.read().splitlines()
        eye = _parse_float3(lines[0])
        view = _parse_float3(lines[1])
        d = float(lines[2])
        focal = float(lines[3])
        aperture = float(lines[4])
        return Camera.create(eye, view, d, focal, aperture)
    except (ValueError, IndexError):
        return default_camera()
