"""Interactive viewer: camera controller + HTTP frame server.

Rebuilds the reference's interactive layer (ModelViewController.cpp,
UserInterface.cpp) for a headless TPU host — see gsrt.viewer.server.
"""

from gsrt.viewer.controller import CameraController
from gsrt.viewer.server import ViewerServer

__all__ = ["CameraController", "ViewerServer"]
