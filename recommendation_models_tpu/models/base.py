"""sklearn API glue (SURVEY.md §2.1 row 10).

The reference inherits `sklearn.base.BaseEstimator` for
`get_params`/`set_params`/clone/grid-search compatibility. We do the same
when sklearn is importable and carry a minimal shim otherwise so the core
framework has zero hard dependency on sklearn.
"""

from __future__ import annotations

import inspect

try:
    from sklearn.base import BaseEstimator

except ImportError:  # pragma: no cover - sklearn is baked into this image

    class BaseEstimator:  # type: ignore[no-redef]
        """Minimal stand-in honoring the sklearn estimator contract."""

        @classmethod
        def _get_param_names(cls):
            sig = inspect.signature(cls.__init__)
            return sorted(
                p.name for p in sig.parameters.values()
                if p.name != "self" and p.kind != p.VAR_KEYWORD
            )

        def get_params(self, deep=True):
            return {n: getattr(self, n) for n in self._get_param_names()}

        def set_params(self, **params):
            valid = set(self._get_param_names())
            for key, val in params.items():
                if key not in valid:
                    raise ValueError(f"invalid parameter {key!r}")
                setattr(self, key, val)
            return self


def resolve_alias(primary, alias, default, primary_name, alias_name):
    """Resolve a reference-name kwarg alias pair with watertight conflict
    detection (ADVICE r3: a literal-default guard let
    ``ALS(reg=0.1, lambda_=0.5)`` silently train with 0.5).

    ``primary`` uses a ``None`` sentinel default so an explicitly-passed
    value — even one equal to the documented default — is distinguishable.
    Setting both to different values raises; setting either alone works.
    """
    if alias is None:
        return default if primary is None else primary
    if primary is not None and primary != alias:
        raise ValueError(
            f"both {primary_name}={primary} and its alias "
            f"{alias_name}={alias} are set; pass only one")
    return alias


__all__ = ["BaseEstimator", "resolve_alias"]
