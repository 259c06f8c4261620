"""Interactive frontend: pty-driven session test + preview unit tests.

The reference app is a live GLUT window with WASD/mouse camera and an
'm' mode cycle (src/main.cu:303-395); the TPU app's --interactive mode
drives the same camera primitives from a raw-mode terminal. The session
test runs the real app under a pseudo-terminal, sends move/look/mode
keys, and checks the ANSI framebuffer answers back and the camera moved.
"""

import os
import select
import subprocess
import sys
import time

import numpy as np
import pytest

from tpu_raytracing.app.interactive import ansi_preview


def test_ansi_preview_shapes():
    img = (np.arange(64 * 64 * 4) % 251).astype(np.uint8).reshape(64, 64, 4)
    s = ansi_preview(img, 40, 10)
    lines = s.split("\n")
    assert len(lines) == 10
    assert all("▀" in ln for ln in lines)
    assert "\x1b[38;2;" in s and "\x1b[48;2;" in s


def test_ansi_preview_small_image():
    img = np.zeros((4, 4, 3), np.uint8)
    s = ansi_preview(img, 100, 50)
    assert len(s.split("\n")) == 2  # 4 rows -> 2 half-block lines


def test_interactive_session_moves_camera():
    import pty

    master, slave = pty.openpty()
    env = dict(os.environ)
    # JAX_PLATFORMS is latched by sitecustomize before user code runs;
    # the app honours TPURT_PLATFORM via jax.config instead.
    env["TPURT_PLATFORM"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "tpu_raytracing.app.main",
         "--scene", "cornell", "--type", "bottom-up", "--width", "32",
         "--height", "32", "--tracer", "wide", "--interactive",
         "--output", "/tmp/tpurt_interactive"],
        stdin=slave, stdout=slave, stderr=subprocess.DEVNULL, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    os.close(slave)

    def read_all(timeout):
        out = b""
        end = time.time() + timeout
        while time.time() < end:
            r, _, _ = select.select([master], [], [], 0.5)
            if r:
                try:
                    out += os.read(master, 65536)
                except OSError:
                    break
            if b"mode=" in out and b"pos=" in out:
                break
        return out

    try:
        first = read_all(420)  # first frame includes the jit compile
        assert b"mode=DEPTH" in first, first[-400:]
        assert "▀".encode() in first
        pos0 = first.split(b"pos=(")[-1].split(b")")[0]

        os.write(master, b"w")  # move forward
        os.write(master, b"m")  # cycle render mode
        # Wide window: the BOX_TESTS frame pays a fresh jit compile, and
        # under a fully loaded box (the whole suite + background builds)
        # 180 s flaked once in round 5.
        moved = read_all(420)
        assert b"mode=BOX_TESTS" in moved, moved[-400:]
        pos1 = moved.split(b"pos=(")[-1].split(b")")[0]
        assert pos0 != pos1, (pos0, pos1)

        os.write(master, b"x")  # quit
        proc.wait(timeout=60)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(master)
