"""Headless camera controller — controller.ts parity.

The reference maps browser input events to camera motion each frame
(controller.ts:136-170: WASD + space/shift/q translation at MOVE_SPEED = 2.0
units/s, pointer-look at ROTATE_SPEED = pi/18 rad/s per accumulated pixel).
Headless, the same state machine is driven programmatically: feed key
press/release and pointer-move events, then call ``update(dt)`` once per
frame — exactly the reference's per-frame integration, including the
accumulation reset on any motion (via Renderer.move_camera/rotate_camera).
"""

from __future__ import annotations

import math

MOVE_SPEED = 2.0  # controller.ts:3
ROTATE_SPEED = math.pi / 18  # controller.ts:4
PINCH_DOLLY_SCALE = 0.001  # controller.ts:96-97 (deltaDistance * 0.001)


class Controller:
    def __init__(self, renderer):
        self.renderer = renderer
        self._pressed: dict[str, bool] = {}
        self._mouse_dx = 0.0
        self._mouse_dy = 0.0

    # --- event feeds (the headless stand-ins for DOM listeners) -----------
    def key_down(self, key: str) -> None:
        self._pressed[key] = True

    def key_up(self, key: str) -> None:
        self._pressed[key] = False

    def mouse_move(self, dx: float, dy: float) -> None:
        """Accumulate pointer deltas (controller.ts:41-48)."""
        self._mouse_dx += dx
        self._mouse_dy += dy

    def touch_move(self, dx: float, dy: float) -> None:
        """One-finger touch look: same accumulation path as the mouse
        (controller.ts:69-84 feeds mouseMovement from single-touch deltas)."""
        self.mouse_move(dx, dy)

    def pinch(self, delta_distance: float) -> None:
        """Two-finger pinch dolly (controller.ts:85-101): the change in
        finger separation, in pixels, dollies the camera forward/backward
        IMMEDIATELY (the reference applies it in the touch handler, not the
        per-frame update), scaled by PINCH_DOLLY_SCALE."""
        if delta_distance != 0.0:
            self.renderer.move_camera(
                delta_distance * PINCH_DOLLY_SCALE, 0.0, 0.0
            )

    # --- per-frame integration (controller.ts:136-170) ---------------------
    def update(self, delta_time: float) -> None:
        r = self.renderer
        if self._pressed.get("w"):
            r.move_camera(MOVE_SPEED * delta_time, 0.0, 0.0)
        if self._pressed.get("s"):
            r.move_camera(-MOVE_SPEED * delta_time, 0.0, 0.0)
        if self._pressed.get("a"):
            r.move_camera(0.0, -MOVE_SPEED * delta_time, 0.0)
        if self._pressed.get("d"):
            r.move_camera(0.0, MOVE_SPEED * delta_time, 0.0)
        if self._pressed.get(" "):
            r.move_camera(0.0, 0.0, MOVE_SPEED * delta_time)
        if self._pressed.get("Shift") or self._pressed.get("q"):
            r.move_camera(0.0, 0.0, -MOVE_SPEED * delta_time)

        if self._mouse_dx != 0.0 or self._mouse_dy != 0.0:
            r.rotate_camera(
                self._mouse_dx * -ROTATE_SPEED * delta_time,
                self._mouse_dy * -ROTATE_SPEED * delta_time,
            )
            self._mouse_dx = 0.0
            self._mouse_dy = 0.0
