"""Shared utilities.

Rebuild of the reference ``utils/__init__.py`` grab-bag (reference lines cited
per function).  Torch-free: host code uses numpy/PIL, device math uses jnp.
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Logging (utils/__init__.py:96-152)
# ---------------------------------------------------------------------------

_ANSI = {
    "DEBUG": "\x1b[38;21m",
    "INFO": "\x1b[38;5;39m",
    "WARNING": "\x1b[38;5;226m",
    "ERROR": "\x1b[38;5;196m",
    "CRITICAL": "\x1b[31;1m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _ANSI.get(record.levelname, "")
        fmt = f"{color}[%(levelname)s] %(name)s: %(message)s{_RESET}"
        return logging.Formatter(fmt).format(record)


class ExitHandler(logging.StreamHandler):
    """logger.error terminates the process (reference ExitHandler,
    utils/__init__.py:145-152): converts soft errors to hard failures."""

    def emit(self, record):
        super().emit(record)
        if record.levelno >= logging.ERROR:
            sys.exit(1)


def create_logger(name: str, level: str = "info", exit_on_error: bool = True) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level.upper())
    if not logger.handlers:
        handler = ExitHandler(sys.stdout) if exit_on_error else logging.StreamHandler(sys.stdout)
        handler.setFormatter(_ColorFormatter())
        logger.addHandler(handler)
        logger.propagate = False
    return logger


# ---------------------------------------------------------------------------
# Profiling (utils/__init__.py:47-93): named click-timer
# ---------------------------------------------------------------------------


class Clock:
    """Named wall-clock probe with min/max/avg tabulation."""

    def __init__(self):
        self._last: Optional[float] = None
        self._stats: Dict[str, List[float]] = {}

    def click(self, name: Optional[str] = None) -> None:
        now = time.perf_counter()
        if name is not None and self._last is not None:
            self._stats.setdefault(name, []).append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "min": min(v),
                "max": max(v),
                "avg": sum(v) / len(v),
                "count": len(v),
            }
            for k, v in self._stats.items()
        }

    def report(self) -> str:
        lines = []
        for k, s in self.summary().items():
            lines.append(
                f"{k}: avg {s['avg']*1e3:.2f}ms min {s['min']*1e3:.2f}ms "
                f"max {s['max']*1e3:.2f}ms (n={s['count']})"
            )
        return "\n".join(lines)


global_clock = Clock()


# ---------------------------------------------------------------------------
# Math helpers
# ---------------------------------------------------------------------------


def compute_psnr(mse) -> jnp.ndarray:
    """PSNR from MSE (utils/__init__.py:323-325)."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def density2alpha(densities, dists):
    """1 - exp(-relu(sigma) * dist) (utils/__init__.py:352-353)."""
    return 1.0 - jnp.exp(-jnp.maximum(densities, 0.0) * dists)


def match_colors_for_image_set(
    image_set: np.ndarray, style_img: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """SVD color transfer of an image set onto a style image's color statistics
    (utils/__init__.py:262-295).  Host-side numpy (runs once at data load).

    Args:
        image_set: [N, H, W, 3] float in [0, 1].
        style_img: [H, W, 3].

    Returns:
        (transferred [N, H, W, 3], color_tf [4, 4]).
    """
    sh = image_set.shape
    x = image_set.reshape(-1, 3).astype(np.float64)
    s = style_img.reshape(-1, 3).astype(np.float64)

    mu_c = x.mean(0, keepdims=True)
    mu_s = s.mean(0, keepdims=True)

    cov_c = (x - mu_c).T @ (x - mu_c) / x.shape[0]
    cov_s = (s - mu_s).T @ (s - mu_s) / s.shape[0]

    u_c, sig_c, _ = np.linalg.svd(cov_c)
    u_s, sig_s, _ = np.linalg.svd(cov_s)

    scl_c = np.diag(1.0 / np.sqrt(np.clip(sig_c, 1e-8, 1e8)))
    scl_s = np.diag(np.sqrt(np.clip(sig_s, 1e-8, 1e8)))

    tmp_mat = u_s @ scl_s @ u_s.T @ u_c @ scl_c @ u_c.T
    tmp_vec = mu_s - mu_c @ tmp_mat.T

    out = x @ tmp_mat.T + tmp_vec
    out = np.clip(out, 0.0, 1.0).reshape(sh).astype(np.float32)

    color_tf = np.eye(4)
    color_tf[:3, :3] = tmp_mat
    color_tf[:3, 3] = tmp_vec[0]
    return out, color_tf


def collage_h(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Horizontal collage of two [C, H, W] images, bottom-padded with zeros
    (utils/__init__.py:305-320)."""
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    if img1.ndim == 4:
        img1 = img1[0]
    if img2.ndim == 4:
        img2 = img2[0]
    h_out = max(img1.shape[-2], img2.shape[-2])

    def pad(img):
        if img.shape[-2] < h_out:
            padding = np.zeros((img.shape[0], h_out - img.shape[-2], img.shape[-1]), img.dtype)
            return np.concatenate([img, padding], axis=-2)
        return img

    return np.concatenate([pad(img1), pad(img2)], axis=-1)


# ---------------------------------------------------------------------------
# IO helpers
# ---------------------------------------------------------------------------


def parse_rgb(path: Union[str, Path], size=None) -> np.ndarray:
    """Load an image file -> [C, H, W] float32 in [0, 1]; optional resize by
    longer edge or explicit (w, h) (utils/__init__.py:425-441)."""
    from PIL import Image

    img = Image.open(path)
    if size is not None:
        if isinstance(size, int):
            w, h = img.size
            if w > h:
                size = (size, int(size * h / w))
            else:
                size = (int(size * w / h), size)
        img = img.resize(size)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return np.moveaxis(arr, -1, 0)


def save_image(arr: np.ndarray, path: Union[str, Path]) -> None:
    """Save a [C, H, W] or [H, W, C] float array in [0, 1] as a PNG."""
    from PIL import Image

    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[0] in (1, 3, 4):
        arr = np.moveaxis(arr, 0, -1)
    arr = np.clip(np.nan_to_num(arr), 0.0, 1.0)
    img = (arr * 255).astype(np.uint8)
    if img.shape[-1] == 1:
        img = img[..., 0]
    Image.fromarray(img).save(path)


def save_gif(frames: List[np.ndarray], path: Union[str, Path], fps: float = 3.75) -> None:
    """Save [H, W, C] uint8 frames as an animated GIF (replaces imageio.mimsave,
    trainers/style.py:150-151)."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )


def batch_exec(fn, *out_buffers, bsize: int):
    """Generic chunked execution into preallocated output buffers
    (reference utils.batch_exec, utils/__init__.py:181-259).

    The TPU render path prefers static-shape chunking under jit; this host
    helper remains for large ad-hoc evaluations.  ``fn(chunk...) -> tuple``
    fills ``out_buffers`` slice by slice (numpy arrays).
    """

    def runner(*inputs):
        n = len(inputs[0])
        for start in range(0, n, bsize):
            sl = slice(start, min(start + bsize, n))
            res = fn(*[inp[sl] for inp in inputs])
            if not isinstance(res, tuple):
                res = (res,)
            for buf, r in zip(out_buffers, res):
                buf[sl] = np.asarray(r)
        return out_buffers if len(out_buffers) > 1 else out_buffers[0]

    return runner


def format_bytes(bytes_count: int, unit: str = "B", prec: int = 3) -> str:
    """(utils/__init__.py:356-371)"""
    units = {"B": 0, "KB": 1, "MB": 2, "GB": 3}
    assert unit in units
    return f"{bytes_count / (1024 ** units[unit]):.{prec}f}{unit}"


def print_memory_usage(desc: str, unit: str = "MB") -> None:
    """Device-memory probe (reference print_memory_usage,
    utils/__init__.py:444-464, which reads CUDA allocator stats)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        used = format_bytes(stats.get("bytes_in_use", 0), unit)
        peak = format_bytes(stats.get("peak_bytes_in_use", 0), unit)
        print(f"{desc}: In use - {used}, Peak - {peak}")
    except Exception:
        print(f"{desc}: device memory stats unavailable")


def color_str2rgb(color: str):
    """Named color -> RGB floats (utils/__init__.py:297-302).  Uses matplotlib
    when available, else a minimal built-in table."""
    try:
        import matplotlib.colors as mcolors

        return mcolors.to_rgb(color)
    except ImportError:
        table = {
            "white": (1.0, 1.0, 1.0), "black": (0.0, 0.0, 0.0),
            "red": (1.0, 0.0, 0.0), "green": (0.0, 0.5, 0.0),
            "blue": (0.0, 0.0, 1.0), "gray": (0.5, 0.5, 0.5),
        }
        assert color in table, f'Invalid color "{color}"'
        return table[color]


class loader:
    """Decorator mapping missing/invalid data files to logged errors
    (reference utils.loader, utils/__init__.py:403-418)."""

    def __init__(self, logger=None):
        self.logger = logger

    def __call__(self, fn):
        def wrapped(path, *args, **kwargs):
            p = Path(path)
            msg = None
            if not p.exists():
                msg = f'Path "{p}" does not exist'
            else:
                try:
                    return fn(path, *args, **kwargs)
                except (OSError, KeyError, ValueError) as e:
                    msg = f'Failed loading "{p}": {e}'
            if self.logger is not None:
                self.logger.error(msg)
            else:
                raise FileNotFoundError(msg)

        return wrapped


def cycle(iterable: Iterable):
    """Infinite dataset cycling (utils/__init__.py:346-349)."""
    while True:
        for item in iterable:
            yield item


def rmtree(path: Path) -> None:
    """Recursive delete (utils/__init__.py:477-488)."""
    path = Path(path)
    if path.is_file():
        path.unlink()
    else:
        for child in path.iterdir():
            rmtree(child)
        path.rmdir()


def prompt_bool(msg: str, assume_yes: bool = False) -> bool:
    """Interactive Y/N guard for destructive ops (utils/__init__.py:467-474).

    Non-interactive runs (no TTY) answer NO unless ``assume_yes`` — a silent
    yes would let a batch job wipe a non-empty directory."""
    if assume_yes:
        return True
    if not sys.stdin.isatty():
        print(f"{msg} — no TTY; answering no (pass --yes to confirm).")
        return False
    result = None
    while result not in ("y", "n"):
        result = input(msg + " (Y/N) ").lower()
    return result == "y"


def train_test_split(total: int, split_every: int, is_train: bool) -> List[int]:
    """(utils/__init__.py:491-493)"""
    return [i for i in range(total) if (i % split_every == 0) != is_train]


def get_git_sha() -> str:
    """Best-effort repo version stamp for checkpoints (utils/__init__.py:374-377)."""
    import subprocess

    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=Path(__file__).parent,
                stderr=subprocess.DEVNULL,
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"


def tab10_colormap(n: int) -> np.ndarray:
    """First n colors of the matplotlib tab10 palette as [n, 3] floats
    (used for segmentation visualizations, trainers/base.py:139-142).
    Hard-coded so matplotlib isn't required."""
    base = np.array(
        [
            (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
            (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
            (188, 189, 34), (23, 190, 207),
        ],
        dtype=np.float32,
    ) / 255.0
    reps = (n + 9) // 10
    return np.tile(base, (reps, 1))[:n]
