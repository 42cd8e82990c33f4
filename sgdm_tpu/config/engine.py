"""Hydra-compatible configuration engine.

The reference drives everything through Hydra (`main.py:21`
`@hydra.main(config_path="config", config_name="config_base")` with a 9-group
defaults list in `config/config_base.yaml:1-11`, `${...}` interpolation, and
`target:`/`params:` object construction via
`diffusion_utils/util.py:254-268 instantiate_from_config`).  Hydra is not part
of the TPU image, so this module implements the subset of Hydra the framework
needs, with the *same override grammar* so reference CLI invocations keep
working:

  * a ``defaults:`` list in the base config selecting one YAML per group
    (``pl: default``, ``data: cifar10`` ...),
  * group overrides (``data=in64_pickle``),
  * dotted value overrides (``sg.params.cond_scale=2``),
  * additive overrides (``+vis.chainvis=1``) and deletions (``~exp.condmix``),
  * ``${a.b.c}`` interpolation (resolved after all merges),
  * ``target:`` / ``params:`` instantiation.

Everything is plain Python + PyYAML; no torch, no jax.
"""

from __future__ import annotations

import copy
import importlib
import re
from pathlib import Path
from typing import Any, Iterable

import yaml

__all__ = [
    "Config",
    "compose",
    "instantiate_from_config",
    "get_obj_from_str",
    "to_container",
]


class Config(dict):
    """A dict with attribute access and recursive wrapping (OmegaConf-lite)."""

    def __init__(self, data: dict | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    # -- wrapping ------------------------------------------------------
    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, dict):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return [Config._wrap(v) for v in value]
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(key) from e

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # -- dotted paths --------------------------------------------------
    def select(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if isinstance(node, Config) and part in node:
                node = node[part]
            else:
                return default
        return node

    def set_path(self, path: str, value: Any, *, create: bool = True) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node:
                if not create:
                    raise KeyError(f"config path '{path}' does not exist")
                node[part] = Config()
            node = node[part]
            if not isinstance(node, Config):
                raise TypeError(f"cannot descend into non-dict at '{part}' of '{path}'")
        if not create and parts[-1] not in node:
            raise KeyError(
                f"Could not override '{path}': key does not exist. "
                f"Prefix the override with '+' to add it."
            )
        node[parts[-1]] = value

    def delete_path(self, path: str) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            node = node[part]
        del node[parts[-1]]

    def get(self, key, default=None):  # keep dict.get but wrapped already
        return super().get(key, default)


def to_container(node: Any) -> Any:
    """Recursively convert ``Config`` to plain dicts/lists."""
    if isinstance(node, Config):
        return {k: to_container(v) for k, v in node.items()}
    if isinstance(node, list):
        return [to_container(v) for v in node]
    return node


# ----------------------------------------------------------------------
# merge
# ----------------------------------------------------------------------

def merge_into(dst: Config, src: dict) -> Config:
    """Deep-merge ``src`` into ``dst`` (src wins; dicts merge recursively)."""
    for k, v in src.items():
        if k in dst and isinstance(dst[k], Config) and isinstance(v, dict):
            merge_into(dst[k], v)
        else:
            dst[k] = v
    return dst


# ----------------------------------------------------------------------
# interpolation
# ----------------------------------------------------------------------

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


class _Missing:
    pass


_MISSING = _Missing()


def _resolve_node(root: Config, value: Any, stack: tuple[str, ...]) -> Any:
    if isinstance(value, str):
        full = _INTERP_RE.fullmatch(value.strip())
        if full:  # whole-string interpolation keeps the referent's type
            return _lookup(root, full.group(1).strip(), stack)

        def sub(m: re.Match) -> str:
            res = _lookup(root, m.group(1).strip(), stack)
            return str(res)

        return _INTERP_RE.sub(sub, value) if "${" in value else value
    return value


def _lookup(root: Config, path: str, stack: tuple[str, ...]) -> Any:
    if path in stack:
        raise ValueError(f"interpolation cycle through '{path}'")
    node: Any = root
    for part in path.split("."):
        if isinstance(node, Config) and part in node:
            node = node[part]
        else:
            raise KeyError(f"interpolation key '{path}' not found")
    return _deep_resolve(root, node, stack + (path,))


def _deep_resolve(root: Config, node: Any, stack: tuple[str, ...] = ()) -> Any:
    if isinstance(node, Config):
        out = Config()
        for k, v in node.items():
            out[k] = _deep_resolve(root, v, stack)
        return out
    if isinstance(node, list):
        return [_deep_resolve(root, v, stack) for v in node]
    return _resolve_node(root, node, stack)


def resolve(cfg: Config) -> Config:
    """Resolve all ``${...}`` interpolations against the config root."""
    return _deep_resolve(cfg, cfg)


# ----------------------------------------------------------------------
# compose
# ----------------------------------------------------------------------

def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics (Hydra behavior)."""
    if text == "":
        return ""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _split_override(ov: str) -> tuple[str, str]:
    if "=" not in ov:
        raise ValueError(f"override '{ov}' must look like key=value (or ~key)")
    key, value = ov.split("=", 1)
    return key.strip(), value


def compose(
    config_dir: str | Path,
    config_name: str = "config_base",
    overrides: Iterable[str] = (),
) -> Config:
    """Compose a config exactly like ``hydra.compose`` for our subset.

    Group selection overrides (``data=cifar10``) must name a YAML in
    ``config_dir/<group>/``; everything else is a value override.
    """
    config_dir = Path(config_dir)
    base = _load_yaml(config_dir / f"{config_name}.yaml")
    defaults: list = base.pop("defaults", [])

    # --- figure out group choices (defaults list + group overrides) ----
    choices: dict[str, str | None] = {}
    order: list[str] = []
    self_pos = len(defaults)
    for i, entry in enumerate(defaults):
        if entry == "_self_":
            self_pos = i
            continue
        if isinstance(entry, dict):
            (group, choice), = entry.items()
        else:
            raise ValueError(f"unsupported defaults entry: {entry!r}")
        choices[group] = choice
        order.append(group)

    value_overrides: list[tuple[str, str, Any]] = []  # (mode, key, value)
    for ov in overrides:
        ov = ov.strip()
        if not ov:
            continue
        if ov.startswith("~"):
            value_overrides.append(("del", ov[1:].split("=", 1)[0], None))
            continue
        add = ov.startswith("+")
        key, raw = _split_override(ov[1:] if add else ov)
        is_group = (
            not add
            and "." not in key
            and key in choices
            and isinstance(raw, str)
            and (config_dir / key / f"{_parse_value(raw)}.yaml").exists()
        )
        if is_group:
            choices[key] = str(_parse_value(raw))
        else:
            value_overrides.append(("add" if add else "set", key, _parse_value(raw)))

    # --- merge: groups in defaults order, then the base config ---------
    cfg = Config()
    merged_self = False

    def merge_self() -> None:
        nonlocal merged_self
        merge_into(cfg, base)
        merged_self = True

    for i, group in enumerate(order):
        if i == self_pos:
            merge_self()
        choice = choices[group]
        if choice is None:
            continue
        group_file = config_dir / group / f"{choice}.yaml"
        if not group_file.exists():
            raise FileNotFoundError(f"config group file not found: {group_file}")
        merge_into(cfg, {group: _load_yaml(group_file)})
    if not merged_self:
        merge_self()

    # --- apply value overrides -----------------------------------------
    for mode, key, value in value_overrides:
        if mode == "del":
            cfg.delete_path(key)
        elif mode == "add":
            cfg.set_path(key, value, create=True)
        else:
            try:
                cfg.set_path(key, value, create=False)
            except KeyError:
                # Hydra allows overriding keys nested in freshly-selected
                # groups; keep strictness for obvious typos at the top level.
                if cfg.select(key.rsplit(".", 1)[0]) is not None:
                    cfg.set_path(key, value, create=True)
                else:
                    raise

    return resolve(cfg)


# ----------------------------------------------------------------------
# instantiate (reference: diffusion_utils/util.py:254-268)
# ----------------------------------------------------------------------

def get_obj_from_str(string: str, reload: bool = False) -> Any:
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        mod = importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: dict, **extra_kwargs: Any) -> Any:
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    return get_obj_from_str(config["target"])(**params)
