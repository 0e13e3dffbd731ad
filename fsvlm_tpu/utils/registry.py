"""Plugin registry.

Capability parity with the reference registry (Dassl.pytorch
dassl/utils/registry.py:7-69): decorator-based registration, duplicate
detection, did-you-mean suggestions on missing names.
"""

import difflib


class Registry:
    """A name -> object registry supporting decorator registration."""

    def __init__(self, name):
        self._name = name
        self._obj_map = {}

    def _do_register(self, name, obj, force=False):
        if name in self._obj_map and not force:
            raise KeyError(
                f'An object named "{name}" was already registered in "{self._name}" registry'
            )
        self._obj_map[name] = obj

    def register(self, obj=None, force=False):
        if obj is None:
            # used as a decorator
            def wrapper(fn_or_class):
                self._do_register(fn_or_class.__name__, fn_or_class, force=force)
                return fn_or_class

            return wrapper
        # used as a function call
        self._do_register(obj.__name__, obj, force=force)
        return obj

    def get(self, name):
        if name not in self._obj_map:
            suggestion = difflib.get_close_matches(name, self._obj_map.keys(), n=1)
            hint = f" Did you mean: {suggestion[0]}?" if suggestion else ""
            raise KeyError(
                f'Object name "{name}" does not exist in "{self._name}" registry.'
                f" Available: {sorted(self._obj_map.keys())}.{hint}"
            )
        return self._obj_map[name]

    def registered_names(self):
        return sorted(self._obj_map.keys())

    def __contains__(self, name):
        return name in self._obj_map


def check_availability(requested, available):
    """Raise with a did-you-mean hint when ``requested`` not in ``available``.

    Mirrors dassl/utils/tools.py:160-173 semantics.
    """
    if requested not in available:
        suggestion = difflib.get_close_matches(requested, available, n=1)
        hint = f" Did you mean: {suggestion[0]}?" if suggestion else ""
        raise ValueError(
            f"The requested one is expected to belong to {sorted(available)}, "
            f"but got [{requested}].{hint}"
        )
