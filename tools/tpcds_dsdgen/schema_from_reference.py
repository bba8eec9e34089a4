"""Emit the TPC-DS schema as CREATE TABLE DDL by parsing the reference's
schema header IN PLACE (/root/reference/extension/tpcds/dsdgen/include/
dsdgen_schema.hpp — the TPC Council's standard schema; nothing is copied
into this repo, same oracle pattern as the query/answer files).

Usage: python schema_from_reference.py [out.sql]
"""

import re
import sys

HDR = "/root/reference/extension/tpcds/dsdgen/include/dsdgen_schema.hpp"


def parse(path=HDR):
    src = open(path).read()
    tables = []
    # struct blocks carry Name; Columns[] and Types[] arrays follow
    for m in re.finditer(
            r'struct (\w+)Info \{\s*static constexpr char \*Name = '
            r'"(\w+)";', src):
        info, name = m.group(1), m.group(2)
        cm = re.search(
            r'const char \*%sInfo::Columns\[\] = \{(.*?)\};' % info,
            src, re.S)
        tm = re.search(
            r'const LogicalType %sInfo::Types\[\] = \{(.*?)\};' % info,
            src, re.S)
        if not cm or not tm:
            continue
        cols = re.findall(r'"(\w+)"', cm.group(1))
        types = []
        for tt in re.finditer(
                r'LogicalType::(\w+)(?:\((\d+),\s*(\d+)\))?', tm.group(1)):
            kind = tt.group(1)
            if kind == "DECIMAL":
                types.append(f"DECIMAL({tt.group(2)},{tt.group(3)})")
            else:
                types.append(kind)
        assert len(cols) == len(types), (name, len(cols), len(types))
        tables.append((name, list(zip(cols, types))))
    return tables


def ddl(tables):
    out = []
    for name, cols in tables:
        body = ",\n  ".join(f"{c} {t}" for c, t in cols)
        out.append(f"CREATE TABLE {name} (\n  {body}\n);")
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    tables = parse()
    text = ddl(tables)
    if len(sys.argv) > 1:
        open(sys.argv[1], "w").write(text)
        print(f"wrote {len(tables)} tables to {sys.argv[1]}")
    else:
        print(text)
