"""Config system: YAML + ${...} interpolation + multirun sweeps.

Replaces the reference's Hydra usage (``@hydra.main`` entry points with
``config_dataset.yaml``/``config_simulation.yaml`` pairs and multirun
sweepers; SURVEY.md §2.1 "Config system").  The schema of the YAML files is
kept compatible: ``problem_name``, ``problem_instance``,
``problem_initialpoint``, ``solver_name``, ``solver_option.common`` +
``solver_option.<SOLVER>`` overrides, ``output_path`` with ``${...}``
interpolation, and a ``sweeper.params`` block for multirun.

CLI override grammar (Hydra-like): ``key=value`` (dots for nesting); with
``-m``/``--multirun``, comma-separated values sweep the cross product.
"""

from __future__ import annotations

import itertools
import re
from typing import Any, Dict, List

import yaml

_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


class Config(dict):
    """Dict with attribute access (cfg.problem_name) and nested lookup."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) else v

    def get_path(self, dotted: str, default=None):
        cur: Any = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        cur = self
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur[parts[-1]] = value


_NUMBER = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _coerce(value):
    """PyYAML (YAML 1.1) reads '1e-2' as a string; coerce numeric-looking
    strings to numbers, recursively (what OmegaConf/Hydra do)."""
    if isinstance(value, str) and _NUMBER.match(value):
        f = float(value)
        return int(f) if f.is_integer() and ("e" not in value.lower() and "." not in value) else f
    if isinstance(value, dict):
        return {k: _coerce(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_coerce(v) for v in value]
    return value


def _parse_scalar(s: str):
    """YAML-ish scalar parsing for CLI override values."""
    return _coerce(yaml.safe_load(s))


def _interpolate(value, root: Config):
    if isinstance(value, str):
        def repl(match):
            v = root.get_path(match.group(1))
            return str(v) if v is not None else match.group(0)

        # full-string reference keeps native type
        m = _INTERP.fullmatch(value)
        if m is not None:
            v = root.get_path(m.group(1))
            return v if v is not None else value
        return _INTERP.sub(repl, value)
    if isinstance(value, dict):
        return {k: _interpolate(v, root) for k, v in value.items()}
    if isinstance(value, list):
        return [_interpolate(v, root) for v in value]
    return value


def load_config(
    path: str, overrides: List[str] | None = None, interpolate: bool = True
) -> Config:
    with open(path) as f:
        raw = _coerce(yaml.safe_load(f) or {})
    cfg = Config(raw)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override '{ov}' must be key=value")
        k, v = ov.split("=", 1)
        cfg.set_path(k, _parse_scalar(v))
    if not interpolate:
        return cfg
    return Config(_interpolate(cfg, cfg))


def sweep_configs(path: str, overrides: List[str] | None = None) -> List[Config]:
    """Expand the multirun cross product.

    Sweep axes come from the config's ``sweeper.params`` block (also
    accepted under ``hydra.sweeper.params`` for schema compatibility),
    overridden/extended by comma-separated CLI overrides.  Matches the
    reference protocol of sweeping instance x initial point x solver
    (``README.md:72-107``).
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    base = Config(raw)
    params: Dict[str, list] = {}
    sweeper = base.get_path("sweeper.params") or base.get_path("hydra.sweeper.params") or {}
    for k, v in dict(sweeper).items():
        if isinstance(v, str):
            params[k] = [_parse_scalar(x) for x in v.split(",")]
        elif isinstance(v, list):
            params[k] = [v]  # a literal list value is a single choice
        else:
            params[k] = [v]
    scalar_overrides = []
    for ov in overrides or []:
        k, v = ov.split("=", 1)
        if "," in v and not v.strip().startswith("["):
            params[k] = [_parse_scalar(x) for x in v.split(",")]
        elif k in params:
            # Single-value override of a sweep axis PINS it (Hydra
            # semantics): without this the per-combo set_path would clobber
            # the override with every sweep value.
            params[k] = [_parse_scalar(v)]
        else:
            scalar_overrides.append(ov)

    if not params:
        return [load_config(path, scalar_overrides)]
    keys = sorted(params)
    configs = []
    for combo in itertools.product(*(params[k] for k in keys)):
        # Interpolation must happen AFTER the sweep values are applied, or
        # ${problem_initialpoint}-style paths freeze at their defaults and
        # every job writes to the same directory.
        cfg = load_config(path, scalar_overrides, interpolate=False)
        for k, v in zip(keys, combo):
            cfg.set_path(k, v)
        configs.append(Config(_interpolate(cfg, cfg)))
    return configs


def solver_options_from_cfg(cfg: Config, solver_name: str) -> dict:
    """common <- solver-specific merge (``base_simulator.py:51-67``)."""
    so = cfg.get_path("solver_option") or {}
    option = dict(so.get("common", {}))
    option.update(so.get(solver_name, {}))
    return option


def maybe_help(argv, doc):
    """Shared -h/--help handling for the hand-rolled experiment CLIs."""
    if any(a in ("-h", "--help") for a in argv):
        print(doc)
        raise SystemExit(0)
