"""Build + run the native 6502 core's C++ test suite from pytest so the CPU
CI covers the native Atari groundwork."""

import shutil
import subprocess

import pytest

if shutil.which("make") is None or shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

import os

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")


def test_m6502_suite():
    out = subprocess.run(
        ["make", "-C", NATIVE, "test-atari"], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "all tests passed" in out.stdout
