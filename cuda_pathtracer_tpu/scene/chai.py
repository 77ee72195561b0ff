"""Chai-script scene loader.

The reference embeds a chaiscript VM and registers a small scene-building API
(getScriptedScene, src/sceneBuilder.h:271-306): Material/GameObject/Plane
/float3 types, DiffuseMaterial, make_float3, and the scene_add_* functions.
This module interprets the same script surface (the subset exercised by
example_scene.chai and sponza.chai — var declarations, field assignment,
nested member assignment, numeric literals with 'f' suffixes, the registered
constructors) by translating each statement to a restricted Python eval/exec
against adapter objects.
"""
from __future__ import annotations

import ast
import re

import numpy as np

from .scene import Scene, Material, GameObject, Plane as ScenePlane


class float3:
    """Mutable xyz value with the chai-registered field accessors."""

    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x = float(x)
        self.y = float(y)
        self.z = float(z)

    def tuple(self):
        return (self.x, self.y, self.z)

    def __repr__(self):
        return f'float3({self.x}, {self.y}, {self.z})'


def make_float3(a, b=None, c=None) -> float3:
    if b is None:
        return float3(a, a, a)
    return float3(a, b, c)


class ChaiMaterial:
    """Adapter exposing the chai-registered Material fields
    (sceneBuilder.h:287-294)."""

    def __init__(self, diffuse: float3):
        self.diffuse_color = diffuse
        self.specular_color = float3()
        self.emission = float3()
        self.reflect = 0.0
        self.glossy = 0.0
        self.transmit = 0.0
        self.refractive_index = 0.0
        self.absorption = float3()

    def to_material(self) -> Material:
        def t(v):
            return v.tuple() if isinstance(v, float3) else (v, v, v)
        return Material(diffuse_color=t(self.diffuse_color),
                        specular_color=t(self.specular_color),
                        emission=t(self.emission),
                        reflect=float(self.reflect),
                        glossy=float(self.glossy),
                        transmit=float(self.transmit),
                        refractive_index=float(self.refractive_index),
                        absorption=t(self.absorption))


def DiffuseMaterial(color: float3) -> ChaiMaterial:
    return ChaiMaterial(color)


class ChaiGameObject:
    def __init__(self, model_id: int):
        self.model_id = int(model_id)
        self.position = float3()
        self.rotation = float3()
        self.scale = float3(1, 1, 1)

    def to_object(self) -> GameObject:
        return GameObject(self.model_id,
                          position=np.array(self.position.tuple()),
                          rotation=np.array(self.rotation.tuple()),
                          scale=np.array(self.scale.tuple()))


class ChaiPlane:
    def __init__(self, normal: float3, d, material):
        self.normal = normal
        self.d = float(d)
        self.material = int(material)


_FLOAT_SUFFIX = re.compile(r'(\d+(?:\.\d+)?)f\b')


def _translate(line: str) -> str:
    line = line.strip()
    if not line or line.startswith('//') or line.startswith('#'):
        return ''
    line = line.rstrip(';').strip()
    if line.startswith('var '):
        line = line[4:]
    line = _FLOAT_SUFFIX.sub(r'\1', line)
    line = line.replace('true', 'True').replace('false', 'False')
    return line


def _check_stmt(stmt: str) -> None:
    """Whitelist-validate one translated statement before execution.

    The reference's chaiscript VM cannot run arbitrary host code, so neither
    may a .chai file here: only calls to registered names, plain/attribute
    assignment, literals and arithmetic are allowed. In particular attribute
    chains that could escape an empty __builtins__ sandbox
    (x.__class__.__mro__...) are rejected outright via the dunder check.
    """
    tree = ast.parse(stmt, mode='exec')

    def fail(node, why):
        raise ValueError(f'disallowed chai construct ({why}): '
                         f'{ast.dump(node)[:80]}')

    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.Expr, ast.Assign, ast.Load,
                             ast.Store, ast.Call, ast.Constant, ast.Tuple,
                             ast.BinOp, ast.UnaryOp, ast.keyword,
                             ast.Add, ast.Sub, ast.Mult, ast.Div, ast.USub,
                             ast.UAdd)):
            if isinstance(node, ast.Call) and not isinstance(
                    node.func, (ast.Name, ast.Attribute)):
                fail(node, 'computed callee')
            continue
        if isinstance(node, ast.Name):
            if node.id.startswith('__'):
                fail(node, 'dunder name')
            continue
        if isinstance(node, ast.Attribute):
            if node.attr.startswith('__'):
                fail(node, 'dunder attribute')
            continue
        fail(node, type(node).__name__)


def get_scripted_scene(path: str, asset_dirs=()) -> Scene:
    """Evaluate a .chai scene script (getScriptedScene,
    src/sceneBuilder.h:271-306)."""
    scene = Scene(asset_dirs=asset_dirs)

    def scene_add_material(mat: ChaiMaterial) -> int:
        return scene.add_material(mat.to_material())

    def scene_add_model(filename, scale, rotation: float3, offset: float3,
                        material, use_mtl=False) -> int:
        try:
            return scene.add_model(filename, float(scale), rotation.tuple(),
                                   offset.tuple(), int(material), bool(use_mtl))
        except FileNotFoundError:
            # scripts reference assets the reference repo doesn't ship
            # (sponza.obj in sponza.chai) — degrade to a procedural stand-in
            # of similar scale so the script still runs (see scene/procedural)
            import sys
            print(f'chai: {filename} not found; using a procedural stand-in',
                  file=sys.stderr)
            from . import procedural
            return procedural.add_cathedral(scene, int(material))

    def scene_add_plane(plane: ChaiPlane):
        scene.add_plane(ScenePlane(plane.normal.tuple(), plane.d, plane.material))

    def scene_add_object(obj: ChaiGameObject) -> int:
        return scene.add_object(obj.to_object())

    env = {
        '__builtins__': {},
        'make_float3': make_float3,
        'float3': float3,
        'DiffuseMaterial': DiffuseMaterial,
        'GameObject': ChaiGameObject,
        'Plane': ChaiPlane,
        'scene_add_material': scene_add_material,
        'scene_add_model': scene_add_model,
        'scene_add_plane': scene_add_plane,
        'scene_add_object': scene_add_object,
        # alias tolerating the `cene_add_object` typo shipped in the
        # reference's example_scene.chai:17
        'cene_add_object': scene_add_object,
    }

    # accumulate physical lines into statements (calls may span lines until
    # their parentheses balance, as in example_scene.chai:10-14)
    pending = ''
    pending_line = 0
    with open(path) as f:
        for lineno, raw in enumerate(f, 1):
            part = _translate(raw)
            if not part:
                continue
            if not pending:
                pending_line = lineno
            pending = (pending + ' ' + part).strip()
            if pending.count('(') > pending.count(')'):
                continue
            stmt, pending = pending, ''
            try:
                _check_stmt(stmt)
                exec(stmt, env)  # noqa: S102 — AST-whitelisted above
            except Exception as e:
                raise RuntimeError(
                    f'{path}:{pending_line}: error in chai statement '
                    f'{stmt!r}: {e}') from e
    if pending:
        raise RuntimeError(f'{path}:{pending_line}: unterminated statement '
                           f'{pending!r}')

    scene.finalize()
    return scene
