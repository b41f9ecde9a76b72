"""On-demand g++ build + ctypes loader for the native components.

Build artifacts are cached in ``$FTT_NATIVE_CACHE`` (default: a
``_build`` dir next to this file; falls back to a per-user tmp dir when the
package directory is read-only). A compile is triggered only when the cached
.so is missing or older than its source; concurrent builders race benignly
via an atomic rename.
"""

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_LOADED = {}


def _cache_dir() -> Path:
    env = os.environ.get('FTT_NATIVE_CACHE')
    if env:
        d = Path(env)
    else:
        d = _SRC_DIR / '_build'
    try:
        d.mkdir(parents=True, exist_ok=True)
        probe = d / '.probe'
        probe.touch()
        probe.unlink()
        return d
    except OSError:
        d = Path(tempfile.gettempdir()) / f'ftt_native_{os.getuid()}'
        d.mkdir(parents=True, exist_ok=True)
        return d


def _build(src: Path, out: Path) -> bool:
    tmp = out.with_suffix(f'.tmp{os.getpid()}.so')
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
           '-fno-math-errno', str(src), '-o', str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Load (building if needed) ``<name>.cpp`` from this directory.

    Returns None when the library cannot be built or loaded — callers fall
    back to their numpy implementations.
    """
    if name in _LOADED:
        return _LOADED[name]
    src = _SRC_DIR / f'{name}.cpp'
    if not src.is_file():
        _LOADED[name] = None
        return None
    out = _cache_dir() / f'lib{name}.so'
    try:
        if not out.is_file() or out.stat().st_mtime < src.stat().st_mtime:
            if not _build(src, out):
                _LOADED[name] = None
                return None
        lib = ctypes.CDLL(str(out))
    except OSError:
        lib = None
    _LOADED[name] = lib
    return lib
