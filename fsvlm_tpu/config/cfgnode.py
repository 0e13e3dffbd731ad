"""A minimal yacs-compatible CfgNode.

The reference config system is yacs (Dassl.pytorch dassl/config/defaults.py).
yacs is not available in this environment, so this is a small reimplementation
of the subset the framework contract needs: attribute access, nested nodes,
``merge_from_file`` (YAML), ``merge_from_list`` (CLI opts), ``freeze``/
``defrost``, ``clone``, and yacs' strict behavior of rejecting non-existent
keys and type mismatches on merge.
"""

import copy

import yaml

_VALID_SCALARS = (str, int, float, bool, type(None))


class CfgNode(dict):
    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        init_dict = init_dict or {}
        for k, v in init_dict.items():
            if isinstance(v, dict):
                v = CfgNode(v)
            self[k] = v

    # ---- attribute protocol -------------------------------------------------
    def __getattr__(self, name):
        if name in self:
            return self[name]
        raise AttributeError(f"Non-existent config key: {name}")

    def __setattr__(self, name, value):
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set {name} to {value}, but CfgNode is immutable"
            )
        self[name] = value

    # ---- mutability ---------------------------------------------------------
    def freeze(self):
        self._set_immutable(True)

    def defrost(self):
        self._set_immutable(False)

    def is_frozen(self):
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, flag):
        self.__dict__[CfgNode.IMMUTABLE] = flag
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(flag)

    def clone(self):
        cloned = CfgNode()
        for k, v in self.items():
            if isinstance(v, CfgNode):
                cloned[k] = v.clone()
            else:
                cloned[k] = copy.deepcopy(v)
        return cloned

    # ---- merging ------------------------------------------------------------
    def merge_from_file(self, cfg_filename):
        with open(cfg_filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        self._merge_dict(loaded, [])

    def merge_from_other_cfg(self, other):
        self._merge_dict(other, [])

    def _merge_dict(self, d, key_path):
        if self.is_frozen():
            raise AttributeError("Attempted to merge into an immutable CfgNode")
        for k, v in d.items():
            full = ".".join(key_path + [str(k)])
            if k not in self:
                raise KeyError(f"Non-existent config key: {full}")
            if isinstance(self[k], CfgNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Cannot merge non-dict into config node {full}")
                self[k]._merge_dict(v, key_path + [str(k)])
            else:
                self[k] = _check_and_coerce(self[k], v, full)

    def merge_from_list(self, opts):
        if self.is_frozen():
            raise AttributeError("Attempted to merge into an immutable CfgNode")
        if len(opts) % 2 != 0:
            raise ValueError(f"Override list has odd length: {opts}")
        for full_key, v in zip(opts[0::2], opts[1::2]):
            keys = full_key.split(".")
            node = self
            for sub in keys[:-1]:
                if sub not in node or not isinstance(node[sub], CfgNode):
                    raise KeyError(f"Non-existent config key: {full_key}")
                node = node[sub]
            leaf = keys[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {full_key}")
            if isinstance(v, str):
                v = _decode_value(v)
            node[leaf] = _check_and_coerce(node[leaf], v, full_key)

    # ---- pretty print -------------------------------------------------------
    def __str__(self):
        def _indent(s, n):
            return "\n".join(" " * n + line for line in s.split("\n"))

        lines = []
        for k in sorted(self.keys()):
            v = self[k]
            if isinstance(v, CfgNode):
                lines.append(f"{k}:")
                lines.append(_indent(str(v), 2))
            else:
                lines.append(f"{k}: {v}")
        return "\n".join(lines)

    def __repr__(self):
        return f"CfgNode({super().__repr__()})"

    def dump(self):
        def to_plain(v):
            if isinstance(v, CfgNode):
                return {k: to_plain(x) for k, x in v.items()}
            if isinstance(v, tuple):  # safe_dump cannot represent tuples
                return [to_plain(x) for x in v]
            return v

        return yaml.safe_dump(to_plain(self))


def _decode_value(s):
    """Parse a CLI string into a python value (yacs semantics:
    ast.literal_eval first — so "('a','b')" becomes a tuple, matching
    yacs' _decode_cfg_value which the reference's scripts rely on for
    list-valued opts — then yaml for scalars like "true"/"1e-3")."""
    import ast

    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        pass
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    # yaml 1.1 resolves on/off/yes/no to bools; yacs' _decode_cfg_value keeps
    # them as strings (only literal_eval), and the string-typed mode knobs
    # (e.g. DATALOADER.DEVICE_RESIDENT "on"/"off", defaults.py) depend on it
    if isinstance(v, bool) and s.lower() not in ("true", "false"):
        return s
    return v


def _check_and_coerce(old, new, full_key):
    """yacs-style type checking with a few sanctioned coercions."""
    if isinstance(new, dict):
        raise TypeError(f"Cannot replace config leaf {full_key} with a dict")
    old_t, new_t = type(old), type(new)
    if old is None or new is None or old_t is new_t:
        return new
    # sanctioned coercions
    if isinstance(old, (tuple, list)) and isinstance(new, (tuple, list)):
        return old_t(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, int) and isinstance(new, float):
        return new  # widen to float (e.g. LOSS weights given as ints in defaults)
    if isinstance(old, bool) != isinstance(new, bool) and {old_t, new_t} <= {bool, int}:
        return bool(new)
    raise ValueError(
        f"Type mismatch ({old_t} vs {new_t}) for config key {full_key}: {old} vs {new}"
    )
