#!/usr/bin/env python
"""Extract the MegaDepth hourglass architecture into a JSON spec.

The reference defines the net (``MegaDepth/pytorch_DIW_scratch.py:33-764``) as
one literal expression tree of ``nn.Sequential``/``LambdaMap``/``LambdaReduce``
constructors (a Torch7 conversion).  Rather than hand-transcribing ~760 lines,
this tool AST-parses that literal (structural analysis of the read-only
reference — no code is executed or copied) and emits a compact JSON tree that
``vfidkr_tpu.models.megadepth`` interprets.

Node types:
  seq{children}  conv{in,out,k,s,p}  bn{ch,affine}  relu
  maxpool  avgpool  upnearest  concat_table{children}  concat{children}
  add{children}

Usage: python tools/extract_megadepth_spec.py [--out vfidkr_tpu/models/megadepth_spec.json]
"""

from __future__ import annotations

import argparse
import ast
import json
import pathlib

REF = pathlib.Path("/root/reference/MegaDepth/pytorch_DIW_scratch.py")


def _pair(node):
    if isinstance(node, ast.Tuple):
        return [n.value for n in node.elts]
    if isinstance(node, ast.Constant):
        return [node.value, node.value]
    raise ValueError(ast.dump(node))


def convert(node: ast.AST):
    if not isinstance(node, ast.Call):
        raise ValueError(f"unexpected node {ast.dump(node)[:80]}")
    fn = node.func
    name = fn.attr if isinstance(fn, ast.Attribute) else fn.id

    if name == "Sequential":
        return {"type": "seq", "children": [convert(a) for a in node.args]}
    if name == "Conv2d":
        args = node.args
        cin = args[0].value
        cout = args[1].value
        k = _pair(args[2])
        s = _pair(args[3]) if len(args) > 3 else [1, 1]
        p = _pair(args[4]) if len(args) > 4 else [0, 0]
        return {"type": "conv", "in": cin, "out": cout, "k": k, "s": s, "p": p}
    if name == "BatchNorm2d":
        ch = node.args[0].value
        affine = True
        if len(node.args) > 3:
            affine = bool(node.args[3].value)
        return {"type": "bn", "ch": ch, "affine": affine}
    if name == "ReLU":
        return {"type": "relu"}
    if name == "MaxPool2d":
        return {"type": "maxpool"}
    if name == "AvgPool2d":
        return {"type": "avgpool"}
    if name == "UpsamplingNearest2d":
        return {"type": "upnearest"}
    if name == "LambdaMap":
        # LambdaMap(lambda x: x, m1, m2, ...) == nn.ConcatTable
        return {"type": "concat_table", "children": [convert(a) for a in node.args[1:]]}
    if name == "LambdaReduce":
        lam = node.args[0]
        src = ast.unparse(lam)
        kind = "concat" if "cat" in src else "add"
        return {"type": kind, "children": [convert(a) for a in node.args[1:]]}
    raise ValueError(f"unhandled constructor {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="vfidkr_tpu/models/megadepth_spec.json")
    ap.add_argument("--ref", default=str(REF))
    args = ap.parse_args()

    tree = ast.parse(pathlib.Path(args.ref).read_text())
    spec = None
    for stmt in tree.body:
        if (isinstance(stmt, ast.Assign)
                and isinstance(stmt.targets[0], ast.Name)
                and stmt.targets[0].id == "pytorch_DIW_scratch"):
            spec = convert(stmt.value)
    assert spec is not None, "pytorch_DIW_scratch assignment not found"

    def count(node, t):
        c = int(node["type"] == t)
        return c + sum(count(ch, t) for ch in node.get("children", []))

    print(f"convs={count(spec, 'conv')} bns={count(spec, 'bn')} "
          f"relus={count(spec, 'relu')} adds={count(spec, 'add')} "
          f"concats={count(spec, 'concat')} tables={count(spec, 'concat_table')}")
    pathlib.Path(args.out).write_text(json.dumps(spec))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
