"""Minimal reader for R .rda / .rds serialization (XDR format, versions 2 and 3).

Supports the SEXP types needed to decode the reference's bundled data.frames
(reference: /root/reference/data/*.rda): REALSXP, INTSXP, STRSXP, LGLSXP,
VECSXP, LISTSXP (pairlists/attributes), CHARSXP, SYMSXP.

Usage: python tools/read_rda.py <file.rda>  -> prints structure
       read_rda(path) -> dict of name -> python object
"""
import gzip
import struct
import sys

# SEXP type codes (Rinternals.h)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
RAWSXP = 24
# pseudo-codes used by the serializer
REFSXP = 255
NILVALUE_SXP = 254
GLOBALENV_SXP = 253
UNBOUNDVALUE_SXP = 252
MISSINGARG_SXP = 251
BASENAMESPACE_SXP = 250
NAMESPACESXP = 249
PACKAGESXP = 248
PERSISTSXP = 247
CLASSREFSXP = 246
GENERICREFSXP = 245
ALTREP_SXP = 238

R_NA_INT = -2147483648


class RDAReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs = []

    def read(self, n):
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def u8(self):
        return self.read(1)[0]

    def i32(self):
        return struct.unpack(">i", self.read(4))[0]

    def f64(self):
        return struct.unpack(">d", self.read(8))[0]

    def header(self):
        magic = self.read(2)
        if magic == b"X\n":
            pass  # XDR binary
        else:
            raise ValueError("only XDR format supported, got %r" % magic)
        version = self.i32()
        self.i32()  # writer version
        self.i32()  # min reader version
        if version >= 3:
            nenc = self.i32()
            self.read(nenc)  # native encoding string
        return version

    def unpack_flags(self):
        flags = self.i32()
        ptype = flags & 0xFF
        levels = flags >> 12
        is_obj = bool(flags & (1 << 8))
        has_attr = bool(flags & (1 << 9))
        has_tag = bool(flags & (1 << 10))
        return ptype, flags, is_obj, has_attr, has_tag

    def read_item(self):
        ptype, flags, is_obj, has_attr, has_tag = self.unpack_flags()
        if ptype == NILVALUE_SXP or ptype == NILSXP:
            return None
        if ptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i32()
            return self.refs[idx - 1]
        if ptype == SYMSXP:
            name = self.read_item()
            self.refs.append(name)
            return name
        if ptype == LISTSXP:
            # pairlist: attributes-first ordering
            attr = self.read_item() if has_attr else None
            tag = self.read_item() if has_tag else None
            car = self.read_item()
            cdr = self.read_item()
            out = [(tag, car)]
            if isinstance(cdr, list):
                out.extend(cdr)
            elif cdr is not None:
                out.append((None, cdr))
            return out
        if ptype == CHARSXP:
            n = self.i32()
            if n == -1:
                return None
            return self.read(n).decode("utf-8", errors="replace")
        if ptype == LGLSXP:
            n = self.i32()
            vals = [self.i32() for _ in range(n)]
            vals = [None if v == R_NA_INT else bool(v) for v in vals]
            return self.finish_vec(vals, has_attr)
        if ptype == INTSXP:
            n = self.i32()
            vals = list(struct.unpack(">%di" % n, self.read(4 * n)))
            vals = [None if v == R_NA_INT else v for v in vals]
            return self.finish_vec(vals, has_attr)
        if ptype == REALSXP:
            n = self.i32()
            vals = list(struct.unpack(">%dd" % n, self.read(8 * n)))
            return self.finish_vec(vals, has_attr)
        if ptype == STRSXP:
            n = self.i32()
            vals = [self.read_item() for _ in range(n)]
            return self.finish_vec(vals, has_attr)
        if ptype == VECSXP:
            n = self.i32()
            vals = [self.read_item() for _ in range(n)]
            return self.finish_vec(vals, has_attr)
        if ptype == RAWSXP:
            n = self.i32()
            return self.finish_vec(self.read(n), has_attr)
        if ptype == ALTREP_SXP:
            info = self.read_item()   # serialized state: class info
            state = self.read_item()
            self.read_item()          # attr placeholder
            return self.decode_altrep(info, state)
        raise ValueError("unsupported SEXP type %d at pos %d" % (ptype, self.pos))

    def pos_flags_ref(self, levels):
        # REFSXP: ref index is packed in the upper bits (levels), or follows
        if levels == 0:
            return self.i32()
        return levels >> 0  # flags>>8 already shifted; levels = flags>>12 -> index

    def decode_altrep(self, info, state):
        # info is a pairlist [(None, symbol), ...] or symbol describing class
        name = None
        if isinstance(info, list):
            first = info[0][1]
            if isinstance(first, list):
                first = first[0][1]
            name = first
        if name == "compact_intseq":
            n, start, step = state
            return self.finish_vec(
                [int(start + i * step) for i in range(int(n))], False)
        if name == "compact_realseq":
            n, start, step = state
            return self.finish_vec(
                [start + i * step for i in range(int(n))], False)
        if name in ("wrap_real", "wrap_integer", "wrap_string", "wrap_logical"):
            payload = state[0][1] if isinstance(state, list) else state
            return payload
        if name == "deferred_string":
            payload = state[0][1] if isinstance(state, list) else state
            return [str(v) for v in payload]
        raise ValueError("unsupported ALTREP class %r" % name)

    def finish_vec(self, vals, has_attr):
        attrs = {}
        if has_attr:
            alist = self.read_item()
            if alist:
                for tag, car in alist:
                    attrs[tag] = car
        return RVec(vals, attrs)


class RVec:
    def __init__(self, values, attrs):
        self.values = values
        self.attrs = attrs or {}

    def __repr__(self):
        return "RVec(n=%d, attrs=%s)" % (len(self.values), list(self.attrs))


def _plain(x):
    if isinstance(x, RVec):
        return x.values
    return x


def to_dataframe(obj):
    """Convert an RVec holding a data.frame into dict of column name -> list."""
    cls = _plain(obj.attrs.get("class"))
    names = _plain(obj.attrs.get("names"))
    cols = {}
    for name, col in zip(names, obj.values):
        if isinstance(col, RVec):
            ccls = _plain(col.attrs.get("class")) or []
            if "factor" in ccls:
                levels = _plain(col.attrs.get("levels"))
                col = [None if v is None else levels[v - 1] for v in col.values]
            elif "Date" in ccls:
                col = col.values  # days since 1970-01-01
            else:
                col = col.values
        cols[name] = col
    return cols


def read_rda(path):
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"BZ":
        import bz2
        data = bz2.decompress(raw)
    elif raw[:6] == b"\xfd7zXZ\x00":
        import lzma
        data = lzma.decompress(raw)
    elif raw[:2] == b"\x1f\x8b":
        data = gzip.decompress(raw)
    else:
        data = raw
    if data[:5] in (b"RDX2\n", b"RDX3\n"):
        data = data[5:]
    r = RDAReader(data)
    r.header()
    top = r.read_item()
    out = {}
    if isinstance(top, list):
        for tag, car in top:
            out[tag] = car
    return out


if __name__ == "__main__":
    for path in sys.argv[1:]:
        objs = read_rda(path)
        for name, obj in objs.items():
            print("==", name, obj)
            if isinstance(obj, RVec) and "names" in obj.attrs:
                df = to_dataframe(obj)
                for c, v in df.items():
                    print("  col %-16s n=%d head=%s" % (c, len(v), v[:5]))
