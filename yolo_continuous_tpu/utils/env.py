"""Environment helpers (utils/helper_io.py:29-41 parity)."""
from __future__ import annotations

import datetime
import subprocess
from pathlib import Path


def date_modified(path: str = __file__) -> str:
    """Human-readable mtime; helper_io.py:29-32."""
    t = datetime.datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def git_describe(path=None) -> str:
    """`git describe --tags --long --always`; helper_io.py:35-41."""
    path = path or Path(__file__).parent
    try:
        return subprocess.check_output(
            f"git -C {path} describe --tags --long --always",
            shell=True, stderr=subprocess.STDOUT).decode()[:-1]
    except subprocess.CalledProcessError:
        return ""
