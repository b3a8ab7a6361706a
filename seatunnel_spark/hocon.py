"""Minimal HOCON reader for SeaTunnel job configs.

The reference's ``.conf`` files are HOCON (typesafe-config). This implements
the subset those job files actually use — nested braces, ``key = value`` /
``key : value`` / ``key { ... }``, arrays, quoted + unquoted scalars,
``#``/``//`` comments, duplicate-key object merge — so a reference config
runs here verbatim via ``config.run_job(spark, load_job_config(text))``.

Substitutions are supported (the reference's production configs lean on env
blocks heavily): ``${path.to.key}`` resolves against the config tree first,
then the process environment, and errors if missing; ``${?key}`` is the
optional form — an unresolved optional drops the key (or contributes an
empty string inside a concatenation). String concatenation of quoted
strings and substitutions on one line works
(``url = "jdbc:mysql://"${host}":"${port}``). Cycles are detected and
raise. Out of scope (raise cleanly): includes, multiline strings.

Reference shape (e.g. connector-cdc-mysql-e2e mysqlcdc_to_mysql.conf):

    env { parallelism = 1  job.mode = "BATCH" }
    source { FakeSource { result_table_name = "fake"  row.num = 16 } }
    transform { Sql { query = "select * from fake" } }
    sink { Assert { rules { ... } } }

``load_job_config`` additionally normalizes the plugin-name-keyed blocks
into the list-of-{plugin: ...} shape ``config.run_job`` executes.
"""

from __future__ import annotations


class HoconError(ValueError):
    pass


def loads(text: str, env: dict | None = None) -> dict:
    """Parse + resolve. ``env`` overrides the process environment for
    substitution fallback (tests)."""
    p = _Parser(text)
    out = p.parse_object(top_level=True)
    p.skip_ws()
    if not p.eof():
        raise HoconError(f"trailing content at {p.i}: {p.s[p.i:p.i+30]!r}")
    return _resolve_tree(out, env)


class _Subst:
    """An unresolved ``${path}`` / ``${?path}`` token."""

    __slots__ = ("path", "optional")

    def __init__(self, path: str, optional: bool):
        self.path = path
        self.optional = optional


class _Concat:
    """Same-line concatenation of strings and substitutions."""

    __slots__ = ("parts",)

    def __init__(self, parts: list):
        self.parts = parts


_MISSING = object()  # unresolved optional substitution → key is dropped


def _resolve_tree(root: dict, env: dict | None = None) -> dict:
    """Resolve substitutions against the config tree, falling back to the
    process environment (typesafe-config's ``ConfigFactory.load()``
    behavior). Values pulled from the environment are type-coerced like
    unquoted scalars; config-tree lookups keep their parsed type."""
    import os

    environ = os.environ if env is None else env
    in_progress: set[str] = set()

    def lookup(path: str):
        """Walk dotted segments through nested dicts; at every level also try
        the remaining joined path as a literal key (this parser stores
        ``job.mode`` flat)."""

        def walk(node, segs):
            if not segs:
                return True, node
            if not isinstance(node, dict):
                return False, None
            joined = ".".join(segs)
            if joined in node:
                return True, node[joined]
            if segs[0] in node:
                return walk(node[segs[0]], segs[1:])
            return False, None

        return walk(root, path.split("."))

    def resolve(v):
        if isinstance(v, _Subst):
            if v.path in in_progress:
                raise HoconError(f"substitution cycle through ${{{v.path}}}")
            found, got = lookup(v.path)
            if found:
                in_progress.add(v.path)
                try:
                    return resolve(got)
                finally:
                    in_progress.discard(v.path)
            if v.path in environ:
                return _coerce(environ[v.path])
            if v.optional:
                return _MISSING
            raise HoconError(f"unresolved substitution ${{{v.path}}}")
        if isinstance(v, _Concat):
            out = []
            for part in v.parts:
                r = resolve(part)
                if r is _MISSING:
                    continue
                out.append("" if r is None else str(r))
            return "".join(out)
        if isinstance(v, dict):
            return {
                k: rv
                for k, rv in ((k, resolve(x)) for k, x in v.items())
                if rv is not _MISSING
            }
        if isinstance(v, list):
            return [r for r in (resolve(x) for x in v) if r is not _MISSING]
        return v

    return resolve(root)


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self) -> None:
        s = self.s
        while self.i < len(s):
            c = s[self.i]
            if c in " \t\r\n,":
                self.i += 1
            elif c == "#" or s.startswith("//", self.i):
                while self.i < len(s) and s[self.i] != "\n":
                    self.i += 1
            else:
                return

    def parse_object(self, top_level: bool = False) -> dict:
        self.skip_ws()
        if not top_level:
            if self.peek() != "{":
                raise HoconError(f"expected '{{' at {self.i}")
            self.i += 1
        out: dict = {}
        while True:
            self.skip_ws()
            if self.eof():
                if top_level:
                    return out
                raise HoconError("unterminated object")
            if self.peek() == "}":
                if top_level:
                    raise HoconError(f"unmatched '}}' at {self.i}")
                self.i += 1
                return out
            key = self.parse_key()
            self.skip_ws()
            c = self.peek()
            if c == "{":
                val = self.parse_object()
            elif c in "=:":
                self.i += 1
                self.skip_ws()
                val = self.parse_value()
            else:
                raise HoconError(f"expected '=', ':' or '{{' after key {key!r} at {self.i}")
            if key in out and isinstance(out[key], dict) and isinstance(val, dict):
                out[key] = {**out[key], **val}  # HOCON duplicate-key merge
            else:
                out[key] = val

    def parse_key(self) -> str:
        self.skip_ws()
        if self.peek() == '"':
            return self.parse_quoted()
        j = self.i
        while j < len(self.s) and self.s[j] not in " \t\r\n=:{}":
            j += 1
        if j == self.i:
            raise HoconError(f"empty key at {self.i}")
        key, self.i = self.s[self.i : j], j
        return key

    def parse_value(self):
        c = self.peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        # scalar position: a sequence of ADJACENT quoted strings,
        # ${substitutions} and unquoted chunks, concatenated (HOCON value
        # concatenation — `url = "jdbc:x://"${host}":"${port}`,
        # `p = ${root}/out`). Adjacency (no whitespace between parts) is the
        # continuation rule: whitespace after a quoted/substituted part ends
        # the value, so `name = "t1"  rules { ... }` parses as two pairs.
        parts: list = []
        while True:
            before = self.i
            c = self.peek()
            if c == '"':
                parts.append(("q", self.parse_quoted()))
            elif self.s.startswith("${", self.i):
                parts.append(("s", self.parse_subst()))
            else:
                raw = self.parse_unquoted_chunk()
                if raw:
                    parts.append(("u", raw))
            c = self.peek()
            if (
                self.eof()
                or c in ' \t,\n#}]{'
                or self.s.startswith("//", self.i)
                or self.i == before  # no progress: key-lookahead cut point
            ):
                break
        if not parts:
            raise HoconError(f"empty value at {self.i}")
        if len(parts) == 1:
            kind, v = parts[0]
            return _coerce(v) if kind == "u" else v
        return _Concat([v for _, v in parts])

    def parse_subst(self) -> "_Subst":
        end = self.s.find("}", self.i)
        if end < 0:
            raise HoconError(f"unterminated substitution at {self.i}")
        inner = self.s[self.i + 2 : end]
        self.i = end + 1
        optional = inner.startswith("?")
        path = (inner[1:] if optional else inner).strip()
        if not path:
            raise HoconError(f"empty substitution at {end}")
        return _Subst(path, optional)

    def parse_unquoted_chunk(self) -> str:
        # unquoted scalar: runs to end of line / comma / closing brace or
        # bracket / a quote / the start of a ${substitution}
        j = self.i
        while j < len(self.s) and self.s[j] not in ',\n#}]"':
            if self.s.startswith("//", j) or self.s.startswith("${", j):
                break
            j += 1
        raw = self.s[self.i : j]
        # Two pairs on one line (`parallelism = 1  job.mode = "BATCH"`) must
        # not silently merge into one scalar: terminate the scalar at
        # whitespace followed by another `key =` / `key :` token and rewind
        # so the next pair parses normally. The key lookahead excludes ':'
        # so URL-ish values (`jdbc:derby:...`) — where ':' is inside the
        # first token, never after whitespace — stay whole. The rewind only
        # fires when the truncated head is a single token (a scalar or one
        # bare word — an unambiguous "value then next pair"): multi-word
        # free text containing ` word =` (`query = SELECT ... WHERE b = 1`)
        # is ambiguous — spec HOCON forbids '=' in unquoted strings — so it
        # raises instead of silently splitting into a corrupted value plus a
        # bogus extra pair.
        import re

        nxt = re.search(r'\s+([^\s=:{}\[\],#"]+)\s*[=:]', raw)
        if nxt:
            head = raw[: nxt.start()].strip()
            if re.search(r"\s", head) and not isinstance(
                _coerce(head), (bool, int, float, type(None))
            ):
                raise HoconError(
                    f"ambiguous unquoted value {raw.strip()!r} at {self.i}: "
                    "free text containing a nested `key =` token — quote the "
                    'value ("...") or put each pair on its own line'
                )
            j = self.i + nxt.start()
            raw = raw[: nxt.start()]
        self.i = j
        return raw.strip()

    def parse_array(self) -> list:
        assert self.peek() == "["
        self.i += 1
        out = []
        while True:
            self.skip_ws()
            if self.eof():
                raise HoconError("unterminated array")
            if self.peek() == "]":
                self.i += 1
                return out
            out.append(self.parse_value())

    def parse_quoted(self) -> str:
        assert self.peek() == '"'
        if self.s.startswith('"""', self.i):
            # triple-quoted: verbatim (no escapes), ends at the next """ —
            # the reference's e2e configs use these for multi-line SQL bodies
            end = self.s.find('"""', self.i + 3)
            if end < 0:
                raise HoconError("unterminated triple-quoted string")
            # HOCON: extra trailing quotes belong to the content
            while end + 3 < len(self.s) and self.s[end + 3] == '"':
                end += 1
            val = self.s[self.i + 3 : end]
            self.i = end + 3
            return val
        j = self.i + 1
        buf = []
        while j < len(self.s):
            c = self.s[j]
            if c == "\\" and j + 1 < len(self.s):
                nxt = self.s[j + 1]
                buf.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(nxt, "\\" + nxt))
                j += 2
                continue
            if c == '"':
                self.i = j + 1
                return "".join(buf)
            buf.append(c)
            j += 1
        raise HoconError("unterminated string")


def _coerce(raw: str):
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low == "null":
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


# ------------------------------------------------- SeaTunnel job adapter
def load_job_config(text: str) -> dict:
    """Parse a SeaTunnel ``.conf`` and normalize to config.run_job's shape:
    plugin-name-keyed blocks (``source { FakeSource { ... } }``) become
    ``[{"plugin": "FakeSource", ...}]``; list-shaped blocks pass through."""
    raw = loads(text)
    out: dict = {"env": raw.get("env") or {}, "udf": raw.get("udf") or {}}
    for section in ("source", "transform", "sink"):
        block = raw.get(section)
        if block is None:
            out[section] = []
        elif isinstance(block, list):
            out[section] = block
        elif isinstance(block, dict):
            out[section] = [
                {"plugin": name, **(opts if isinstance(opts, dict) else {})}
                for name, opts in block.items()
            ]
        else:
            raise HoconError(f"{section} block must be an object or array")
    return out
