"""Config dataclasses with a CleanRL-flag-compatible argparse bridge.

The reference exposes every hyperparameter as a ``--kebab-case`` argparse
flag built by hand in each script (reference: src/utils.py:47-129 and the
``parse_args`` body of every cleanrl/*.py script).  Here each trainer
declares one ``@dataclass`` of typed fields and :func:`cli` generates the
identical flag surface from it, including CleanRL's ``strtobool``-style
booleans (``--cuda False`` / bare ``--track`` both work) so existing launch
commands keep working verbatim.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import Any, Optional, Sequence, Type, TypeVar

T = TypeVar("T")

_TRUTHY = {"y", "yes", "t", "true", "on", "1"}
_FALSY = {"n", "no", "f", "false", "off", "0"}


def strtobool(value: str) -> bool:
    """CleanRL-compatible boolean parsing (distutils.util.strtobool)."""
    v = value.strip().lower()
    if v in _TRUTHY:
        return True
    if v in _FALSY:
        return False
    raise argparse.ArgumentTypeError(f"invalid truth value {value!r}")


def flag_name(field_name: str) -> str:
    return "--" + field_name.replace("_", "-")


def _add_field(parser: argparse.ArgumentParser, field: dataclasses.Field) -> None:
    name = flag_name(field.name)
    help_text = field.metadata.get("help", "")
    default = (
        field.default
        if field.default is not dataclasses.MISSING
        else field.default_factory()  # type: ignore[misc]
    )
    ftype = field.type if not isinstance(field.type, str) else eval(field.type)  # noqa: S307
    origin = getattr(ftype, "__origin__", None)
    if ftype is bool or (origin is not None and bool in getattr(ftype, "__args__", ())):
        # strtobool booleans: `--flag`, `--flag True`, `--flag false` all valid
        # (reference: src/utils.py:54-58).
        parser.add_argument(
            name,
            type=lambda x: bool(strtobool(x)),
            default=default,
            nargs="?",
            const=True,
            help=help_text,
        )
    elif origin in (list, tuple) or ftype in (list, tuple):
        args = getattr(ftype, "__args__", (str,))
        parser.add_argument(name, type=args[0], nargs="+", default=default, help=help_text)
    elif origin is not None and type(None) in getattr(ftype, "__args__", ()):
        # Optional[X] — argparse keeps None default when the flag is absent.
        inner = [a for a in ftype.__args__ if a is not type(None)][0]
        parser.add_argument(name, type=inner, default=default, help=help_text)
    else:
        parser.add_argument(name, type=ftype, default=default, help=help_text)


def cli(config_cls: Type[T], argv: Optional[Sequence[str]] = None) -> T:
    """Parse CLI flags into an instance of ``config_cls``.

    If the dataclass defines ``__post_init__`` (e.g. to derive
    ``batch_size = num_envs * num_steps`` like reference src/utils.py:126-127)
    it runs automatically via normal dataclass construction.
    """
    parser = argparse.ArgumentParser()
    for field in dataclasses.fields(config_cls):
        if not field.init or field.metadata.get("derived", False):
            continue
        _add_field(parser, field)
    ns = parser.parse_args(sys.argv[1:] if argv is None else list(argv))
    kwargs: dict[str, Any] = {}
    for field in dataclasses.fields(config_cls):
        if not field.init or field.metadata.get("derived", False):
            continue
        kwargs[field.name] = getattr(ns, field.name)
    args = config_cls(**kwargs)
    # --platform: force the JAX backend before any computation runs.  The
    # environment's TPU plugin may pin JAX_PLATFORMS at interpreter start,
    # so the env var alone is not honored; the config update is.
    platform = getattr(args, "platform", "")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    enable_compile_cache()
    return args


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at ``<repo>/.jax_compile_cache``.

    Remote-tunnel TPU compiles cost 20 s – 6 min per program and the cache is
    per-process by default, so every script relaunch (and every driver bench
    invocation) repays them.  The on-disk cache is backend-keyed and safe for
    concurrent writers; measured hit-path compile on the tunnel backend is
    ~2 s.  MMTRL_NO_COMPILE_CACHE=1 opts out.
    """
    if os.environ.get("MMTRL_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_compile_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def asdict_flat(config: Any) -> dict[str, Any]:
    """Flat dict of a config for hyperparameter logging tables."""
    return dataclasses.asdict(config)
