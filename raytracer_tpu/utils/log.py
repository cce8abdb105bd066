"""Structured, stage-tagged logging.

The reference debugs its three-thread pipeline with prefixed prints
("LOG (UI-…)", "LOG (VRT-…)", "LOG (SRT)", e.g. ``VulkanApp.java:195``,
``VulkanEngine.java:278``, ``SceneBuilder.java:39``). Here that becomes a
stdlib logger per stage with thread names in the format, switchable via
``RAYTPU_LOG`` (the working version of the reference's dead ``.env``
``Config.java`` idea).
"""

from __future__ import annotations

import logging
import os

_FORMAT = "%(asctime)s %(levelname).1s [%(name)s|%(threadName)s] %(message)s"
_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    level = os.environ.get("RAYTPU_LOG", "WARNING").upper()
    logging.basicConfig(level=getattr(logging, level, logging.WARNING),
                        format=_FORMAT, datefmt="%H:%M:%S")
    _configured = True


def get_logger(stage: str) -> logging.Logger:
    _configure()
    return logging.getLogger(f"raytpu.{stage}")
