# Independent NetCDF-3 classic parser written from the public CDF
# format specification (NOT ported from the Scala codec — a second
# implementation in a second language, the tiffcheck.py pattern):
# validates magic/version, dimension and variable lists, attribute
# padding, offset layout, record interleaving, and prints a JSON value
# digest the ScalaTest round-trip compares against the DataFrame.
# No NetCDF library exists in this sandbox, so this is the closest
# available stand-in for an xarray/scipy read-back of the cube sink.
#   python3 devtools/nccheck.py <file.nc>
import json, struct, sys

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}
FMTS = {NC_BYTE: 'b', NC_SHORT: 'h', NC_INT: 'i', NC_FLOAT: 'f', NC_DOUBLE: 'd'}


class R:
    def __init__(self, b):
        self.b, self.p = b, 0

    def take(self, n):
        v = self.b[self.p:self.p + n]
        assert len(v) == n, f"truncated at {self.p}+{n}"
        self.p += n
        return v

    def i4(self):
        return struct.unpack('>i', self.take(4))[0]

    def i8(self):
        return struct.unpack('>q', self.take(8))[0]

    def name(self):
        n = self.i4()
        s = self.take(n).decode('utf-8')
        pad = (4 - n % 4) % 4
        assert self.take(pad) == b'\x00' * pad, f"name '{s}' pad not zeroed"
        return s

    def atts(self):
        tag, n = self.i4(), self.i4()
        assert (tag, n) == (0, 0) or tag == 0x0C, f"bad att tag {tag:#x}"
        out = {}
        for _ in range(n):
            nm = self.name()
            t, cnt = self.i4(), self.i4()
            if t == NC_CHAR:
                v = self.take(cnt).decode('utf-8')
                pad = (4 - cnt % 4) % 4
                assert self.take(pad) == b'\x00' * pad, f"att '{nm}' pad"
            else:
                v = list(struct.unpack(f'>{cnt}{FMTS[t]}', self.take(cnt * SIZES[t])))
                pad = (4 - (cnt * SIZES[t]) % 4) % 4
                self.take(pad)
            out[nm] = v
        return out


def parse(path):
    raw = open(path, 'rb').read()
    r = R(raw)
    assert r.take(3) == b'CDF', "bad magic"
    version = r.take(1)[0]
    assert version in (1, 2), f"unsupported CDF version {version}"
    numrecs = r.i4()
    tag, ndims = r.i4(), r.i4()
    assert (tag, ndims) == (0, 0) or tag == 0x0A, f"bad dim tag {tag:#x}"
    dims = [(r.name(), r.i4()) for _ in range(ndims)]
    gatts = r.atts()
    tag, nvars = r.i4(), r.i4()
    assert (tag, nvars) == (0, 0) or tag == 0x0B, f"bad var tag {tag:#x}"
    vars_ = []
    for _ in range(nvars):
        nm = r.name()
        dimids = [r.i4() for _ in range(r.i4())]
        va = r.atts()
        t, vsize = r.i4(), r.i4()
        begin = r.i8() if version == 2 else r.i4()
        vars_.append(dict(name=nm, dimids=dimids, atts=va, type=t,
                          vsize=vsize, begin=begin))
    header_end = r.p

    def slab(v):
        n = SIZES[v['type']]
        for d in v['dimids']:
            if dims[d][1] != 0:
                n *= dims[d][1]
        return n

    def padded(n):
        return (n + 3) & ~3

    rec = [v for v in vars_ if v['dimids'] and dims[v['dimids'][0]][1] == 0]
    fixed = [v for v in vars_ if v not in rec]
    # offsets must tile the file exactly: fixed slabs after the header,
    # then numrecs interleaved records
    off = header_end
    for v in fixed:
        assert v['begin'] == off, f"{v['name']} begin {v['begin']} != {off}"
        assert v['vsize'] == padded(slab(v)), f"{v['name']} vsize"
        off += padded(slab(v))
    recsize = sum(padded(slab(v)) for v in rec)
    for v in rec:
        assert v['begin'] == off, f"{v['name']} begin {v['begin']} != {off}"
        off += padded(slab(v))
    assert len(raw) == header_end + sum(padded(slab(v)) for v in fixed) \
        + numrecs * recsize, f"file size {len(raw)} does not tile"

    def values(v):
        n = slab(v) // SIZES[v['type']]
        fmt = f">{n}{FMTS[v['type']]}"
        if v in rec:
            out = []
            for k in range(numrecs):
                at = v['begin'] + k * recsize
                out.extend(struct.unpack(fmt, raw[at:at + slab(v)]))
            return out
        return list(struct.unpack(fmt, raw[v['begin']:v['begin'] + slab(v)]))

    digest = {}
    for v in vars_:
        vals = values(v)
        fill = v['atts'].get('_FillValue', [None])[0]
        finite = [x for x in vals if fill is None or abs(x - fill) > 1e-30]
        digest[v['name']] = dict(
            n=len(vals), n_fill=len(vals) - len(finite),
            sum=round(sum(finite), 3) if finite else 0.0,
            first=round(vals[0], 6), last=round(vals[-1], 6))
    return dict(version=version, numrecs=numrecs,
                dims={n: s for n, s in dims}, gatts=sorted(gatts),
                vars={v['name']: v['atts'].get('long_name', v['name'])
                      for v in vars_},
                digest=digest)


if __name__ == '__main__':
    print(json.dumps(parse(sys.argv[1])))
