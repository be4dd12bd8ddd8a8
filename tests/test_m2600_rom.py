"""Execute the reference's actual Skeleton+ cartridge on the native 2600
stack (6507 + RIOT + TIA audio) and verify it runs and programs the audio
channels.  Skipped when the reference ROM is not mounted (the binary is
licensed third-party content and is NOT vendored into this repo)."""

import os
import shutil
import subprocess

import pytest

ROM = "/root/reference/environments/skeleton_plus/SkelPlus.bin"
NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")

if not os.path.exists(ROM):
    pytest.skip("reference Skeleton+ ROM not mounted", allow_module_level=True)
if shutil.which("make") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)


def test_skelplus_executes_and_programs_audio():
    subprocess.run(
        ["make", "-C", NATIVE, "build/run_rom"], check=True, capture_output=True
    )
    out = subprocess.run(
        [os.path.join(NATIVE, "build", "run_rom"), ROM, "120"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "rom: 4096 bytes" in out
    assert "frames=120" in out
    # The game writes TIA registers every frame and programs the audio
    # channels during its attract/game loop.
    tia_writes = int(out.split("tia_writes=")[1].split()[0])
    audio_writes = int(out.split("audio_reg_writes=")[1].split()[0])
    assert tia_writes > 10_000
    assert audio_writes > 50
