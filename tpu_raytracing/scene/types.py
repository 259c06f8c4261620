"""Scene, material/texture library and device-side scene views.

TPU-native re-design of the reference's host scene structures
(reference: src/Common.cuh:44-150, src/FileIO.h:11-24). Host-side containers
hold numpy arrays; `DeviceScene` is the jnp pytree handed to jitted render
functions (the analogue of the reference's `DeviceScene`,
src/Common.cuh:342-351).

Textures: the reference stores per-texture, per-mip device pointers
(src/Common.cuh:61-91). Pointers don't exist in XLA, and ragged per-mip
shapes defeat static compilation, so all mips of all textures are packed into
one flat RGBA8 texel pool plus (texture, lod) offset/size tables — sampling
is then a dense gather from one array.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

# Mirror of the reference's compile-time texture limits (src/Common.cuh:17-18).
MAX_TEXTURE_SIZE = 1024 * 8
NUM_LODS = 13


@dataclasses.dataclass
class Texture:
    """Host texture with a CPU box-filter mip chain (src/Common.cuh:61-91)."""

    name: str
    mips: List[np.ndarray]  # each [h, w, 4] uint8
    max_lod: int = 0

    @property
    def size0(self):
        return self.mips[0].shape[1], self.mips[0].shape[0]

    def generate_lods(self) -> None:
        """Box-filter mip chain, clamped reads at odd edges.

        Matches Texture::GenerateLODs (reference: src/FileIO.cpp:121-150):
        next size is ceil(size/2); each texel averages a 2x2 footprint with
        clamped coordinates; the average is computed in float and truncated
        back to uint8.
        """
        while self.mips[-1].shape[0] > 1 or self.mips[-1].shape[1] > 1:
            src = self.mips[-1].astype(np.float32)
            h, w = src.shape[0], src.shape[1]
            nh, nw = (h + 1) // 2, (w + 1) // 2
            # Clamped 2x2 box filter (ReadTexel clamps out-of-range coords).
            x0 = np.minimum(np.arange(nw) * 2, w - 1)
            x1 = np.minimum(np.arange(nw) * 2 + 1, w - 1)
            y0 = np.minimum(np.arange(nh) * 2, h - 1)
            y1 = np.minimum(np.arange(nh) * 2 + 1, h - 1)
            nxt = (
                src[np.ix_(y0, x0)] + src[np.ix_(y0, x1)] + src[np.ix_(y1, x0)] + src[np.ix_(y1, x1)]
            ) * 0.25
            self.mips.append(nxt.astype(np.uint8))
        self.max_lod = len(self.mips) - 1


@dataclasses.dataclass
class Material:
    """Phong material (reference: src/Common.cuh:93-129)."""

    name: str = ""
    ambient: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    diffuse: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    specular: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    specular_exp: float = 0.0
    texture: int = -1
    bump: int = -1
    disp: int = -1


@dataclasses.dataclass
class Library:
    """Material/texture library with name de-dup (src/Common.cuh:131-150)."""

    materials: List[Material] = dataclasses.field(default_factory=list)
    textures: List[Texture] = dataclasses.field(default_factory=list)
    name_to_mat: Dict[str, int] = dataclasses.field(default_factory=dict)
    name_to_tex: Dict[str, int] = dataclasses.field(default_factory=dict)

    def add_material(self, name: str) -> None:
        self.name_to_mat[name] = len(self.materials)
        self.materials.append(Material(name=name))

    def add_texture(self, name: str, rgba: Optional[np.ndarray]) -> int:
        """De-dup by name; generates the mip chain on first load
        (reference: src/FileIO.cpp:167-184)."""
        if name in self.name_to_tex:
            return self.name_to_tex[name]
        idx = len(self.textures)
        self.name_to_tex[name] = idx
        if rgba is None:
            rgba = np.full((1, 1, 4), (255, 0, 255, 255), np.uint8)
        tex = Texture(name=name, mips=[np.ascontiguousarray(rgba, np.uint8)])
        tex.generate_lods()
        self.textures.append(tex)
        return idx

    def get_material_id(self, name: str) -> int:
        return self.name_to_mat.get(name, -1)


@dataclasses.dataclass
class Scene:
    """Host scene as produced by the OBJ loader (reference: src/FileIO.h:11-24).

    ``triangles`` is [T, 3, 3] float32 (v0, v1, v2); attribute arrays mirror
    the reference ``Attributes`` struct (src/Common.cuh:55-59) as SoA.
    """

    triangles: np.ndarray  # [T, 3, 3] float32
    normals: np.ndarray  # [T, 3, 3] float32 — per-corner shading normals
    uvs: np.ndarray  # [T, 3, 2] float32
    material_ids: np.ndarray  # [T] int32 (-1 = no material)
    library: Library
    aabb_min: np.ndarray  # [3] float32
    aabb_max: np.ndarray  # [3] float32
    light: np.ndarray  # [3] float32

    @property
    def num_triangles(self) -> int:
        return int(self.triangles.shape[0])


@flax.struct.dataclass
class TexturePool:
    """All mips of all textures packed into one flat RGBA texel pool.

    ``offset[t, l]`` is the index of texel (0, 0) of texture t's mip l inside
    ``texels``; -1 marks a missing mip (sampled as magenta, matching
    src/Tracer.cu:115-117). Sizes are per-(texture, lod) width/height.
    """

    texels: jnp.ndarray  # [K, 4] uint8 (flattened row-major per mip)
    offset: jnp.ndarray  # [T, NUM_LODS] int32
    width: jnp.ndarray  # [T, NUM_LODS] int32
    height: jnp.ndarray  # [T, NUM_LODS] int32
    max_lod: jnp.ndarray  # [T] int32


@flax.struct.dataclass
class DeviceMaterials:
    ambient: jnp.ndarray  # [M, 3] float32
    diffuse: jnp.ndarray  # [M, 3] float32
    specular: jnp.ndarray  # [M, 3] float32
    specular_exp: jnp.ndarray  # [M] float32
    texture: jnp.ndarray  # [M] int32
    bump: jnp.ndarray  # [M] int32
    disp: jnp.ndarray  # [M] int32


@flax.struct.dataclass
class DeviceScene:
    """Device-side scene view (reference: src/Common.cuh:342-351)."""

    normals: jnp.ndarray  # [T, 3, 3] float32
    uvs: jnp.ndarray  # [T, 3, 2] float32
    material_ids: jnp.ndarray  # [T] int32
    materials: DeviceMaterials
    textures: TexturePool
    light: jnp.ndarray  # [3] float32
    num_materials: jnp.ndarray  # [] int32 (used by the material-id HSV mode)


def build_texture_pool(textures: List[Texture]) -> TexturePool:
    """Pack host textures (all mips) into a flat pool."""
    num = max(len(textures), 1)
    offset = np.full((num, NUM_LODS), -1, np.int32)
    width = np.zeros((num, NUM_LODS), np.int32)
    height = np.zeros((num, NUM_LODS), np.int32)
    max_lod = np.zeros((num,), np.int32)
    chunks = []
    cursor = 0
    for t, tex in enumerate(textures):
        max_lod[t] = tex.max_lod
        for l, mip in enumerate(tex.mips[:NUM_LODS]):
            h, w = mip.shape[0], mip.shape[1]
            offset[t, l] = cursor
            width[t, l] = w
            height[t, l] = h
            chunks.append(mip.reshape(-1, 4))
            cursor += h * w
    if chunks:
        texels = np.concatenate(chunks, axis=0)
    else:
        texels = np.full((1, 4), (255, 0, 255, 255), np.uint8)
    return TexturePool(
        texels=jnp.asarray(texels),
        offset=jnp.asarray(offset),
        width=jnp.asarray(width),
        height=jnp.asarray(height),
        max_lod=jnp.asarray(max_lod),
    )


def build_device_materials(materials: List[Material]) -> DeviceMaterials:
    """Material table; one default entry is appended for material_id == -1.

    (The reference indexes materials[-1] in that case — UB it never hits
    because its scenes always bind materials; we define it instead.)
    """
    mats = list(materials) + [
        Material(name="__default__", diffuse=np.array([0.7, 0.7, 0.7], np.float32))
    ]
    return DeviceMaterials(
        ambient=jnp.asarray(np.stack([m.ambient for m in mats]).astype(np.float32)),
        diffuse=jnp.asarray(np.stack([m.diffuse for m in mats]).astype(np.float32)),
        specular=jnp.asarray(np.stack([m.specular for m in mats]).astype(np.float32)),
        specular_exp=jnp.asarray(np.array([m.specular_exp for m in mats], np.float32)),
        texture=jnp.asarray(np.array([m.texture for m in mats], np.int32)),
        bump=jnp.asarray(np.array([m.bump for m in mats], np.int32)),
        disp=jnp.asarray(np.array([m.disp for m in mats], np.int32)),
    )


def scene_to_device(scene: Scene) -> DeviceScene:
    """Host→device scene upload (reference: Scene::CopyToDevice, src/main.cu:421-456)."""
    return DeviceScene(
        normals=jnp.asarray(scene.normals.astype(np.float32)),
        uvs=jnp.asarray(scene.uvs.astype(np.float32)),
        material_ids=jnp.asarray(scene.material_ids.astype(np.int32)),
        materials=build_device_materials(scene.library.materials),
        textures=build_texture_pool(scene.library.textures),
        light=jnp.asarray(scene.light.astype(np.float32)),
        num_materials=jnp.int32(len(scene.library.materials)),
    )
