"""Editable scene graph: ModelInstance + Scene with snapshot semantics.

Mirrors the reference's scene model (``scene/Scene.java``,
``scene/ModelInstance.java``): a scene is a flat list of model instances,
each carrying an .obj path, display name, position, per-axis scale, RGB
color, and a material-type float. Edits come from one writer (the app/UI);
the build pipeline consumes immutable snapshots (``Scene.createSnapshot``,
``Scene.java:61-69``). Rotation is deferred exactly as the reference defers
it (``ModelInstance.java:22-23``).

Extends the reference with JSON save/load — the persistence capability the
reference lost when headless mode was removed (``DEVELOPMENT_LOG.md:51``).
"""

from __future__ import annotations

import dataclasses
import json
import threading
from typing import Iterable, Optional

import numpy as np

from raytracer_tpu.core.types import MAT_LAMBERTIAN


@dataclasses.dataclass
class ModelInstance:
    """One placed model. Defaults match reference ModelInstance.java:38-42."""

    model_path: str
    display_name: str = ""
    position: tuple = (0.0, 0.0, 0.0)
    scale: tuple = (1.0, 1.0, 1.0)
    color: tuple = (0.8, 0.8, 0.8)
    material_type: float = MAT_LAMBERTIAN

    def __post_init__(self):
        if not self.display_name:
            self.display_name = self.model_path.rsplit("/", 1)[-1]
        self.position = tuple(float(x) for x in self.position)
        self.scale = tuple(float(x) for x in self.scale)
        self.color = tuple(float(x) for x in self.color)
        self.material_type = float(self.material_type)

    def transform(self, verts: np.ndarray) -> np.ndarray:
        """Scale-then-translate, per vertex (reference
        SceneBuilder.java:172-174 — order matters)."""
        s = np.asarray(self.scale, np.float32)
        p = np.asarray(self.position, np.float32)
        return verts * s + p

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_json(d: dict) -> "ModelInstance":
        return ModelInstance(**d)


class Scene:
    """Thread-safe instance list with snapshot reads.

    The reference uses a CopyOnWriteArrayList (``Scene.java:21``) so the UI
    can edit while the rebuild thread iterates; a lock + list-copy snapshot
    gives the same single-writer/snapshot-reader discipline.
    """

    def __init__(self, instances: Optional[Iterable[ModelInstance]] = None):
        self._lock = threading.Lock()
        self._instances: list[ModelInstance] = list(instances or [])

    def add_instance(self, inst: ModelInstance) -> None:
        with self._lock:
            self._instances.append(inst)

    def remove_instance(self, inst: ModelInstance) -> None:
        with self._lock:
            self._instances.remove(inst)

    def remove_at(self, index: int) -> ModelInstance:
        with self._lock:
            return self._instances.pop(index)

    def clear(self) -> None:
        with self._lock:
            self._instances.clear()

    def get_instances(self) -> list[ModelInstance]:
        with self._lock:
            return list(self._instances)

    def create_snapshot(self) -> list[ModelInstance]:
        """Immutable-enough copy for the scene-rebuild task (instances are
        replaced, not mutated, by the editor surface)."""
        with self._lock:
            return [dataclasses.replace(i) for i in self._instances]

    def __len__(self) -> int:
        with self._lock:
            return len(self._instances)

    # --- persistence (new capability) --------------------------------------

    def save_json(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump([i.to_json() for i in self.get_instances()], f, indent=2)

    @staticmethod
    def load_json(path: str) -> "Scene":
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        return Scene(ModelInstance.from_json(d) for d in data)


def default_scene(asset_dir: str = "assets") -> Scene:
    """The reference default scene (``VulkanApp.java:309-345``): grey matte
    ground plane + metal car. ``car.obj`` is gitignored upstream, so the
    car slot falls back to ``white_mesh.obj`` (10k tris) when absent."""
    import os

    scene = Scene()
    scene.add_instance(ModelInstance(
        model_path=os.path.join(asset_dir, "ground_plane.obj"),
        display_name="Ground Plane",
        position=(0.0, -10.0, 0.0),
        scale=(150.0, 1.0, 150.0),
        color=(0.5, 0.5, 0.5),
        material_type=0.0,
    ))
    car_path = os.path.join(asset_dir, "car.obj")
    if not os.path.exists(car_path):
        car_path = os.path.join(asset_dir, "white_mesh.obj")
    scene.add_instance(ModelInstance(
        model_path=car_path,
        display_name="Car",
        position=(0.0, -8.0, 0.0),
        scale=(2.0, 2.0, 2.0),
        color=(0.6, 0.7, 0.1),
        material_type=1.0,
    ))
    return scene
