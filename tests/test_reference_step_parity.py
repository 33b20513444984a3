"""Step-level numerical parity vs LIVE torch (VERDICT r4 next #2).

The strongest de-risking of the 0.005-lwlrap north star available without
FSDKaggle2019: the reference ``TwoDimensionalCNN`` forward, ``lsep_loss``,
``OneCycleScheduler`` and Adam(amsgrad) step are REIMPLEMENTED here in torch
straight from the reference's architecture (networks/classifiers.py:483-607,
losses.py:47-58, ops/training.py:208-234, ops/training.py:9-12), identical
weights are transplanted from the JAX init, and both sides consume IDENTICAL
waveform batches — the torch side featurizing with actual ``torch.stft``
(the reference op itself, classifiers.py:565-570 via ops/utils.py:110-127).
Loss/grad trajectories over 20 real optimizer steps through the JAX ENGINE
(not a harness re-derivation) must track the torch step within f32
tolerances, for both max and rnn aggregation, plus the 1cycle LR shape.

Slow tier (compile-heavy): runs in the full suite / -m slow.
"""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SR = 16000
N_FFT, HOP = 256, 128
N_CLASSES = 12
B, CLIP = 8, 8192
FEATURES = f"stft_{N_FFT}_{HOP}"
RNN_SIZE = 128


# ---------------------------------------------------------------------------
# torch reimplementation of the reference model (from its description)
# ---------------------------------------------------------------------------


class TorchResnetBlock2d(torch.nn.Module):
    """reference networks/classifiers.py:72-104: three conv(1/3/1)+BN
    stages with PReLUs and the identity added before the last PReLU."""

    def __init__(self, depth):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(depth, depth, 1)
        self.bn1 = nn.BatchNorm2d(depth)
        self.conv2 = nn.Conv2d(depth, depth, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(depth)
        self.conv3 = nn.Conv2d(depth, depth, 1)
        self.bn3 = nn.BatchNorm2d(depth)
        self.prelu1 = nn.PReLU(depth)
        self.prelu2 = nn.PReLU(depth)
        self.prelu3 = nn.PReLU(depth)

    def forward(self, x):
        h = self.prelu1(self.bn1(self.conv1(x)))
        h = self.prelu2(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.prelu3(h + x)


class TorchRef2dCNN(torch.nn.Module):
    """reference TwoDimensionalCNN (networks/classifiers.py:483-607):
    torch.stft -> log(|S|+1e-4) -> freq-encoding channel -> conv blocks
    (BN-conv3-maxpool2-BN-PReLU-resnet) -> global max / biGRU final-state
    aggregation from start_deep_supervision_on -> BN-Linear-BN-PReLU-
    Dropout-Linear head."""

    def __init__(self, num_blocks, sds, base, growth, agg, n_classes):
        super().__init__()
        nn = torch.nn
        self.sds = sds
        self.agg = agg
        self.conv_modules = nn.ModuleList()
        self.rnns = nn.ModuleList()
        total = 0
        depth = 2
        for k in range(num_blocks):
            cin = 2 if k == 0 else depth
            depth = int(growth**k * base)
            self.conv_modules.append(nn.Sequential(
                nn.BatchNorm2d(cin),
                nn.Conv2d(cin, depth, 3, padding=1),
                nn.MaxPool2d(2, 2),
                nn.BatchNorm2d(depth),
                nn.PReLU(depth),
                TorchResnetBlock2d(depth),
            ))
            if k >= sds:
                if agg == "max":
                    total += depth
                else:
                    total += 2 * RNN_SIZE
                    self.rnns.append(nn.Sequential(
                        nn.LayerNorm((depth,)),
                        nn.GRU(depth, RNN_SIZE, batch_first=True,
                               bidirectional=True),
                    ))
        self.global_maxpool = nn.AdaptiveMaxPool2d(1)
        self.output_transform = nn.Sequential(
            nn.BatchNorm1d(total),
            nn.Linear(total, total),
            nn.BatchNorm1d(total),
            nn.PReLU(total),
            nn.Dropout(0.0),
            nn.Linear(total, n_classes),
        )

    def forward(self, signal):
        # reference featurization (ops/utils.py:110-127 + classifiers.py:
        # 565-583): torch.stft magnitude, log(.+1e-4), freq-encoding channel
        window = torch.hann_window(N_FFT, device=signal.device)
        s = torch.stft(signal, N_FFT, HOP, window=window,
                       return_complex=True).abs()
        x = torch.log(s + 1e-4).unsqueeze(1)
        n, _, h, w = x.shape
        vertical = torch.linspace(-1, 1, h, device=x.device)
        vertical = vertical.view(1, 1, -1, 1).repeat(n, 1, 1, w)
        x = torch.cat([x, vertical], dim=1)

        feats = []
        hmap = x
        for k, module in enumerate(self.conv_modules):
            hmap = module(hmap)
            if k >= self.sds:
                if self.agg == "max":
                    feats.append(
                        self.global_maxpool(hmap).squeeze(-1).squeeze(-1))
                else:
                    rnn_in = torch.mean(hmap, 2).permute(0, 2, 1)
                    _, state = self.rnns[k - self.sds](rnn_in)
                    feats.append(state.permute(1, 0, 2).contiguous().view(
                        rnn_in.size(0), -1))
        return self.output_transform(torch.cat(feats, -1))


def torch_lsep_loss(logits, targets):
    """reference losses.py:47-58 (naive LSEP), batch-averaged."""
    differences = logits.unsqueeze(1) - logits.unsqueeze(2)
    where_lower = (targets.unsqueeze(1) < targets.unsqueeze(2)).float()
    exps = differences.exp() * where_lower
    return torch.log(1 + exps.sum(2).sum(1)).mean()


def reference_onecycle_lr(min_lr, max_lr, max_steps, epoch):
    """reference OneCycleScheduler (ops/training.py:208-234): linear warm
    min->max over round(0.3*max_steps), linear anneal max -> min/1e3."""
    mid = int(round(max_steps * 0.3))
    if epoch < mid:
        r = epoch / mid
        return min_lr + r * (max_lr - min_lr)
    r = (epoch - mid) / (max_steps - mid)
    return max_lr + r * (min_lr / 1e3 - max_lr)


class TorchResnetBlock1d(torch.nn.Module):
    """reference networks/classifiers.py:37-69 (1d residual block)."""

    def __init__(self, depth):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv1d(depth, depth, 1)
        self.bn1 = nn.BatchNorm1d(depth)
        self.conv2 = nn.Conv1d(depth, depth, 3, padding=1)
        self.bn2 = nn.BatchNorm1d(depth)
        self.conv3 = nn.Conv1d(depth, depth, 1)
        self.bn3 = nn.BatchNorm1d(depth)
        self.prelu1 = nn.PReLU(depth)
        self.prelu2 = nn.PReLU(depth)
        self.prelu3 = nn.PReLU(depth)

    def forward(self, x):
        h = self.prelu1(self.bn1(self.conv1(x)))
        h = self.prelu2(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.prelu3(h + x)


class TorchRefHierCNN(torch.nn.Module):
    """reference HierarchicalCNN (networks/classifiers.py:107-217): the 1d
    tower treats STFT bins as channels and time as the conv axis —
    torch.stft -> log(|S|+1e-4) -> per-bin BN -> conv3/maxpool2/BN/PReLU/
    resnet blocks -> global max from start_deep_supervision_on -> MLP head."""

    def __init__(self, num_blocks, sds, base, growth, n_classes, input_dim):
        super().__init__()
        nn = torch.nn
        self.sds = sds
        self.conv_modules = nn.ModuleList()
        total = 0
        depth = input_dim
        for k in range(num_blocks):
            cin = input_dim if k == 0 else depth
            depth = int(growth**k * base)
            self.conv_modules.append(nn.Sequential(
                nn.BatchNorm1d(cin),
                nn.Conv1d(cin, depth, 3, padding=1),
                nn.MaxPool1d(2, 2),
                nn.BatchNorm1d(depth),
                nn.PReLU(depth),
                TorchResnetBlock1d(depth),
            ))
            if k >= sds:
                total += depth
        self.global_maxpool = nn.AdaptiveMaxPool1d(1)
        self.output_transform = nn.Sequential(
            nn.BatchNorm1d(total),
            nn.Linear(total, total),
            nn.BatchNorm1d(total),
            nn.PReLU(total),
            nn.Dropout(0.0),
            nn.Linear(total, n_classes),
        )

    def forward(self, signal):
        window = torch.hann_window(N_FFT, device=signal.device)
        s = torch.stft(signal, N_FFT, HOP, window=window,
                       return_complex=True).abs()
        h = torch.log(s + 1e-4)  # (B, F, T): bins are the conv channels
        feats = []
        for k, module in enumerate(self.conv_modules):
            h = module(h)
            if k >= self.sds:
                feats.append(self.global_maxpool(h).squeeze(-1))
        return self.output_transform(torch.cat(feats, -1))


class TorchBasicBlock(torch.nn.Module):
    """Standard resnet-v1 basic block (the reference's pretrainedmodels
    resnet18 trunk, classifiers.py:912-915 with pretrained=None)."""

    def __init__(self, cin, features, stride):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(cin, features, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(features)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(features)
        self.has_proj = cin != features or stride != 1
        if self.has_proj:
            self.downsample = nn.Conv2d(cin, features, 1, stride=stride,
                                        bias=False)
            self.downsample_bn = nn.BatchNorm2d(features)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        r = self.downsample_bn(self.downsample(x)) if self.has_proj else x
        return torch.relu(h + r)


class TorchRefBackbone(torch.nn.Module):
    """reference CNNBackboneClassificationModel (classifiers.py:896-964):
    3-channel log spectrogram -> BN(3) -> resnet18 features -> global max
    -> BN/Linear/BN/PReLU/Dropout/Linear head."""

    def __init__(self, stages, n_classes):
        super().__init__()
        nn = torch.nn
        self.input_norm = nn.BatchNorm2d(3)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        blocks = []
        cin = 64
        for stage, n_blocks in enumerate(stages):
            features = 64 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(TorchBasicBlock(cin, features, stride))
                cin = features
        self.blocks = nn.ModuleList(blocks)
        self.global_maxpool = nn.AdaptiveMaxPool2d(1)
        total = cin
        self.output_transform = nn.Sequential(
            nn.BatchNorm1d(total),
            nn.Linear(total, total),
            nn.BatchNorm1d(total),
            nn.PReLU(total),
            nn.Dropout(0.0),
            nn.Linear(total, n_classes),
        )

    def forward(self, signal):
        window = torch.hann_window(N_FFT, device=signal.device)
        s = torch.stft(signal, N_FFT, HOP, window=window,
                       return_complex=True).abs()
        x = torch.log(s + 1e-4).unsqueeze(1).repeat(1, 3, 1, 1)
        h = torch.relu(self.bn1(self.conv1(self.input_norm(x))))
        h = self.maxpool(h)
        for blk in self.blocks:
            h = blk(h)
        feats = self.global_maxpool(h).squeeze(-1).squeeze(-1)
        return self.output_transform(feats)


# ---------------------------------------------------------------------------
# weight transplant: JAX init -> torch state_dict
# ---------------------------------------------------------------------------


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _map_bn(sd, tkey, jp, js):
    sd[f"{tkey}.weight"] = _t(jp["scale"])
    sd[f"{tkey}.bias"] = _t(jp["bias"])
    sd[f"{tkey}.running_mean"] = _t(js["mean"])
    sd[f"{tkey}.running_var"] = _t(js["var"])
    sd[f"{tkey}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _map_conv(sd, tkey, jp):
    # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
    sd[f"{tkey}.weight"] = _t(np.transpose(jp["kernel"], (3, 2, 0, 1)))
    sd[f"{tkey}.bias"] = _t(jp["bias"])


def _map_linear(sd, tkey, jp):
    sd[f"{tkey}.weight"] = _t(np.asarray(jp["kernel"]).T)
    sd[f"{tkey}.bias"] = _t(jp["bias"])


def _map_conv1d(sd, tkey, jp):
    # flax (k, in, out) -> torch (out, in, k)
    sd[f"{tkey}.weight"] = _t(np.transpose(jp["kernel"], (2, 1, 0)))
    sd[f"{tkey}.bias"] = _t(jp["bias"])


def transplant_hier(params, stats, num_blocks):
    sd = {}
    for k in range(num_blocks):
        p, s = params[f"block{k}"], stats[f"block{k}"]
        pre = f"conv_modules.{k}"
        _map_bn(sd, f"{pre}.0", p["bn_in"], s["bn_in"])
        _map_conv1d(sd, f"{pre}.1", p["conv"])
        _map_bn(sd, f"{pre}.3", p["bn_out"], s["bn_out"])
        sd[f"{pre}.4.weight"] = _t(p["prelu"]["alpha"])
        r, rs = p["resnet"], s["resnet"]
        for i in (1, 2, 3):
            _map_conv1d(sd, f"{pre}.5.conv{i}", r[f"conv{i}"])
            _map_bn(sd, f"{pre}.5.bn{i}", r[f"bn{i}"], rs[f"bn{i}"])
            sd[f"{pre}.5.prelu{i}.weight"] = _t(r[f"prelu{i}"]["alpha"])
    h, hs = params["head"], stats["head"]
    _map_bn(sd, "output_transform.0", h["bn1"], hs["bn1"])
    _map_linear(sd, "output_transform.1", h["fc1"])
    _map_bn(sd, "output_transform.2", h["bn2"], hs["bn2"])
    sd["output_transform.3.weight"] = _t(h["prelu"]["alpha"])
    _map_linear(sd, "output_transform.5", h["fc2"])
    return sd


def _map_gru_direction(sd, prefix, suffix, cell):
    """flax GRUCell {ir,iz,in,hr,hz,hn} -> torch GRU l0 weights.

    torch gate order is r,z,n stacked on dim 0; flax keeps biases on the
    input side (plus the candidate's hidden bias), torch splits them as
    bias_ih/bias_hh — bias_hh_{r,z} set to 0, b_hn carries flax hn.bias."""
    w_ih = np.concatenate([np.asarray(cell[g]["kernel"]).T
                           for g in ("ir", "iz", "in")], axis=0)
    w_hh = np.concatenate([np.asarray(cell[g]["kernel"]).T
                           for g in ("hr", "hz", "hn")], axis=0)
    b_ih = np.concatenate([np.asarray(cell[g]["bias"])
                           for g in ("ir", "iz", "in")], axis=0)
    hid = cell["hn"]["bias"].shape[0]
    b_hh = np.concatenate([np.zeros(hid, np.float32),
                           np.zeros(hid, np.float32),
                           np.asarray(cell["hn"]["bias"])], axis=0)
    sd[f"{prefix}.weight_ih_l0{suffix}"] = _t(w_ih)
    sd[f"{prefix}.weight_hh_l0{suffix}"] = _t(w_hh)
    sd[f"{prefix}.bias_ih_l0{suffix}"] = _t(b_ih)
    sd[f"{prefix}.bias_hh_l0{suffix}"] = _t(b_hh)


def transplant(params, stats, num_blocks, sds, agg):
    sd = {}
    for k in range(num_blocks):
        p, s = params[f"block{k}"], stats[f"block{k}"]
        pre = f"conv_modules.{k}"
        _map_bn(sd, f"{pre}.0", p["bn_in"], s["bn_in"])
        _map_conv(sd, f"{pre}.1", p["conv"])
        _map_bn(sd, f"{pre}.3", p["bn_out"], s["bn_out"])
        sd[f"{pre}.4.weight"] = _t(p["prelu"]["alpha"])
        r, rs = p["resnet"], s["resnet"]
        for i in (1, 2, 3):
            _map_conv(sd, f"{pre}.5.conv{i}", r[f"conv{i}"])
            _map_bn(sd, f"{pre}.5.bn{i}", r[f"bn{i}"], rs[f"bn{i}"])
            sd[f"{pre}.5.prelu{i}.weight"] = _t(r[f"prelu{i}"]["alpha"])
        if agg == "rnn" and k >= sds:
            rn = params[f"rnn{k}"]
            rpre = f"rnns.{k - sds}"
            sd[f"{rpre}.0.weight"] = _t(rn["ln"]["scale"])
            sd[f"{rpre}.0.bias"] = _t(rn["ln"]["bias"])
            _map_gru_direction(sd, f"{rpre}.1", "", rn["GRUCell_0"])
            _map_gru_direction(sd, f"{rpre}.1", "_reverse", rn["GRUCell_1"])
    h = params["head"]
    hs = stats["head"]
    _map_bn(sd, "output_transform.0", h["bn1"], hs["bn1"])
    _map_linear(sd, "output_transform.1", h["fc1"])
    _map_bn(sd, "output_transform.2", h["bn2"], hs["bn2"])
    sd["output_transform.3.weight"] = _t(h["prelu"]["alpha"])
    _map_linear(sd, "output_transform.5", h["fc2"])
    return sd


# ---------------------------------------------------------------------------
# SSL families
# ---------------------------------------------------------------------------


class TorchRefAPC(torch.nn.Module):
    """reference APCModel (networks/apc.py:19-83): affine-free input
    LayerNorm -> LSTM stack -> output LayerNorm -> per-step linear heads,
    L1 loss against the detached normalized input `step` frames ahead.
    Consumes feature frames directly (featurization parity is covered by
    the classifier harnesses; the reference's own featurization is
    bit-rotted — PARITY.md #3)."""

    def __init__(self, input_dim, rnn_size, rnn_layers, steps):
        super().__init__()
        nn = torch.nn
        self.input_norm = nn.LayerNorm((input_dim,),
                                       elementwise_affine=False)
        self.rnn = nn.LSTM(input_dim, rnn_size, num_layers=rnn_layers,
                           batch_first=True)
        self.output_norm = nn.LayerNorm((rnn_size,))
        self.prediction_transforms = nn.ModuleList([
            nn.Sequential(nn.Linear(rnn_size, input_dim))
            for _ in range(steps)
        ])

    def forward(self, feats):
        signal = self.input_norm(feats)
        output, _ = self.rnn(signal)
        output = self.output_norm(output)
        losses = []
        for step, affine in enumerate(self.prediction_transforms, start=1):
            prediction = affine(output[:, :-step, :])
            target = signal.detach()[:, step:, :]
            losses.append(torch.abs(target - prediction).sum(-1).mean())
        return losses


def transplant_apc(params, rnn_layers):
    sd = {}
    for l in range(rnn_layers):
        cell = params[f"OptimizedLSTMCell_{l}"]
        # torch gate order i, f, g, o; flax puts biases on the hidden-side
        # denses only (b_ih stays 0)
        w_ih = np.concatenate([np.asarray(cell[g]["kernel"]).T
                               for g in ("ii", "if", "ig", "io")], axis=0)
        w_hh = np.concatenate([np.asarray(cell[g]["kernel"]).T
                               for g in ("hi", "hf", "hg", "ho")], axis=0)
        b_hh = np.concatenate([np.asarray(cell[g]["bias"])
                               for g in ("hi", "hf", "hg", "ho")], axis=0)
        sd[f"rnn.weight_ih_l{l}"] = _t(w_ih)
        sd[f"rnn.weight_hh_l{l}"] = _t(w_hh)
        sd[f"rnn.bias_ih_l{l}"] = _t(np.zeros_like(b_hh))
        sd[f"rnn.bias_hh_l{l}"] = _t(b_hh)
    sd["output_norm.weight"] = _t(params["output_norm"]["scale"])
    sd["output_norm.bias"] = _t(params["output_norm"]["bias"])
    for k, name in enumerate(sorted(
            n for n in params if n.startswith("prediction_"))):
        _map_linear(sd, f"prediction_transforms.{k}.0", params[name])
    return sd


class TorchTwinCPC(torch.nn.Module):
    """Torch twin of OUR CPCModel. The reference's CausalConv1d
    (cpc.py:20-31) pads kernel_size on BOTH sides then trims kernel_size
    TIME steps after the stride-2 conv — discarding valid encoder steps
    every layer (65 input frames leave ONE encoder step after 5 layers).
    Our CausalConv1d left-pads k-1 with no trim (true causal, nothing
    discarded) — a documented divergence (PARITY.md #12), so this twin
    implements OUR semantics to pin the math/transplant, not the
    reference's truncation bug."""

    def __init__(self, input_dim, n_layers, base, growth, context, steps):
        super().__init__()
        nn = torch.nn
        self.input_bn = nn.BatchNorm1d(input_dim)
        convs, prelus = [], []
        depth = input_dim
        for k in range(n_layers):
            cin = input_dim if k == 0 else depth
            depth = int(growth**k * base)
            convs.append(nn.Conv1d(cin, depth, 3, stride=2))
            prelus.append(nn.PReLU(depth))
        self.convs = nn.ModuleList(convs)
        self.prelus = nn.ModuleList(prelus)
        self.output_bn = nn.BatchNorm1d(depth)
        self.context = nn.GRU(depth, context, batch_first=True)
        self.couplings = nn.ModuleList([
            nn.Conv1d(context, depth, 1) for _ in range(steps)
        ])
        self.steps = steps

    def forward(self, feats):
        h = self.input_bn(feats.permute(0, 2, 1))
        for conv, prelu in zip(self.convs, self.prelus):
            h = prelu(conv(torch.nn.functional.pad(h, (2, 0))))
        z = self.output_bn(h)  # (B, D, S)
        c, _ = self.context(z.permute(0, 2, 1))  # (B, S, C)
        losses = []
        s = z.size(2)
        for step, coupling in enumerate(self.couplings, start=1):
            a = coupling(c.permute(0, 2, 1))  # (B, D, S)
            logits = torch.bmm(z.permute(0, 2, 1), a)  # (B, S, S)
            labels = torch.eye(s - step)
            labels = torch.nn.functional.pad(labels, (0, step, step, 0))
            labels = labels.unsqueeze(0).expand_as(logits)
            losses.append(
                torch.nn.functional.binary_cross_entropy_with_logits(
                    logits, labels))
        return losses


def transplant_cpc(params, stats, n_layers):
    sd = {}
    _map_bn(sd, "input_bn", params["input_bn"], stats["input_bn"])
    for k in range(n_layers):
        _map_conv1d(sd, f"convs.{k}", params[f"enc{k}"]["conv"])
        sd[f"prelus.{k}.weight"] = _t(params[f"prelu{k}"]["alpha"])
    _map_bn(sd, "output_bn", params["output_bn"], stats["output_bn"])
    _map_gru_direction(sd, "context", "", params["GRUCell_0"])
    for k, name in enumerate(sorted(
            n for n in params if n.startswith("coupling_"))):
        # 1x1 Conv1d == Dense on the channel axis
        sd[f"couplings.{k}.weight"] = _t(
            np.asarray(params[name]["kernel"]).T[:, :, None])
        sd[f"couplings.{k}.bias"] = _t(params[name]["bias"])
    return sd


# ---------------------------------------------------------------------------
# the harness
# ---------------------------------------------------------------------------


def _batches(n, seed):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        signal = (rng.randn(B, CLIP) * 0.1).astype(np.float32)
        labels = (rng.rand(B, N_CLASSES) < 0.15).astype(np.float32)
        out.append({
            "signal": signal,
            "lengths": np.full(B, CLIP, np.int32),
            "labels": labels,
            "is_noisy": np.zeros(B, np.float32),
        })
    return out


def _build_engine(agg, lr_desc, weight_decay, max_steps, family="2d"):
    import jax.numpy as jnp

    from freesound_classification_tpu.models.classifiers import (
        HierarchicalCNN,
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.parallel import mesh as mesh_lib
    from freesound_classification_tpu.training.engine import Engine

    cls = TwoDimensionalCNN if family == "2d" else HierarchicalCNN
    model = cls(
        num_conv_blocks=3, start_deep_supervision_on=1, conv_base_depth=8,
        growth_rate=2.0, aggregation_type=agg, n_classes=N_CLASSES,
        dtype=jnp.float32)
    frontend = Frontend(FEATURES, family, sr=SR, dft_precision="high")
    cfg = types.SimpleNamespace(
        optimizer="adam", learning_rate=1e-3, scheduler=lr_desc,
        weight_decay=weight_decay, accumulation_steps=1, epochs=1,
        switch_off_augmentations_on=10**9, _save_every=10**9)
    engine = Engine(model, frontend, cfg, loss="lsep_naive", augment=None,
                    mesh=mesh_lib.make_mesh(1))
    engine.make_optimizer(max_steps=max_steps, steps_per_epoch=max_steps)
    return engine


def _run_parity(agg, weight_decay, n_steps=20, min_lr=1e-3, max_lr=3e-3):
    import jax
    import jax.numpy as jnp

    lr_desc = f"1cycle_{min_lr}_{max_lr}"
    engine = _build_engine(agg, lr_desc, weight_decay, n_steps)
    batches = _batches(4, seed=0)
    engine.init_state(batches[0])

    params = jax.device_get(engine.state.params)
    stats = jax.device_get(engine.state.batch_stats)

    tmodel = TorchRef2dCNN(3, 1, 8, 2.0, agg, N_CLASSES)
    tmodel.load_state_dict(transplant(params, stats, 3, 1, agg), strict=True)
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=min_lr, amsgrad=True,
                           weight_decay=weight_decay)

    # forward parity at init (eval mode, running stats): the strictest
    # check of architecture + featurization + transplant in one number
    tmodel.eval()
    with torch.no_grad():
        tlogits0 = tmodel(torch.from_numpy(batches[0]["signal"])).numpy()
    db0, _ = engine._prep_batch(batches[0])
    inputs0, fl0 = engine.frontend(db0["signal"], db0["lengths"])
    jlogits0 = np.asarray(engine.model.apply(
        {"params": engine.state.params,
         "batch_stats": engine.state.batch_stats},
        inputs0, fl0, train=False)["class_logits"])
    np.testing.assert_allclose(jlogits0, tlogits0, atol=2e-4,
                               err_msg="init eval-forward logits diverge")
    tmodel.train()

    # grad parity at step 0
    x0 = torch.from_numpy(batches[0]["signal"])
    y0 = torch.from_numpy(batches[0]["labels"])
    opt.zero_grad()
    tloss0 = torch_lsep_loss(tmodel(x0), y0)
    tloss0.backward()
    tgrads = {n: p.grad.detach().numpy().copy()
              for n, p in tmodel.named_parameters()}

    def jax_loss_of(p):
        inputs, fl = engine.frontend(db0["signal"], db0["lengths"])
        loss, _ = engine._forward_loss(
            p, engine.state.batch_stats, inputs, fl, db0["labels"],
            jax.random.PRNGKey(0), train=True, row_mask=None)
        return loss

    jloss0, jgrads = jax.value_and_grad(jax_loss_of)(engine.state.params)
    jloss0 = float(jloss0)
    np.testing.assert_allclose(float(tloss0), jloss0, rtol=1e-4)

    checks = {
        "block0.conv.kernel": (
            np.transpose(np.asarray(jgrads["block0"]["conv"]["kernel"]),
                         (3, 2, 0, 1)),
            tgrads["conv_modules.0.1.weight"]),
        "head.fc2.kernel": (
            np.asarray(jgrads["head"]["fc2"]["kernel"]).T,
            tgrads["output_transform.5.weight"]),
        "block2.prelu.alpha": (
            np.asarray(jgrads["block2"]["prelu"]["alpha"]),
            tgrads["conv_modules.2.4.weight"]),
    }
    if agg == "rnn":
        checks["rnn1.gru_fwd.in.kernel"] = (
            np.asarray(jgrads["rnn1"]["GRUCell_0"]["in"]["kernel"]).T,
            tgrads["rnns.0.1.weight_ih_l0"][2 * RNN_SIZE:],
        )
    for name, (jg, tg) in checks.items():
        # normalized atol: different conv-backward accumulation orders
        # cost O(1e-3) f32 noise on O(1) grads (up to ~5e-3 on block0,
        # which aggregates every downstream stage's noise, in the rnn
        # model's long chains); a transplant or formula error would be O(1)
        denom = np.maximum(np.abs(jg).max(), 1e-8)
        np.testing.assert_allclose(
            jg / denom, tg / denom, atol=1e-2,
            err_msg=f"grad mismatch: {name}")

    # 20-step trajectories through the real engine vs the torch loop
    losses_j, losses_t = [], []
    for step in range(n_steps):
        batch = batches[step % len(batches)]

        # torch side: reference train_epoch semantics (classifiers.py:
        # 633-690) — scheduler sets the lr BEFORE each optimizer step
        lr = reference_onecycle_lr(min_lr, max_lr, n_steps, step)
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        tloss = torch_lsep_loss(
            tmodel(torch.from_numpy(batch["signal"])),
            torch.from_numpy(batch["labels"]))
        tloss.backward()
        opt.step()
        losses_t.append(float(tloss))

        db, n = engine._prep_batch(batch)
        partner = (db["signal"], db["lengths"], db["labels"])
        engine.state, out = engine._train_step(
            engine.state, db, 0.0, jnp.int32(n), partner)
        losses_j.append(float(out["loss"]))

    return np.asarray(losses_j), np.asarray(losses_t)


def _assert_trajectory(lj, lt):
    """Documented tolerances: the two conv-backward implementations carry
    ~1e-3 relative f32 accumulation noise on gradients (measured at step
    0), which adam+BN roughly double per step — the trajectory is a
    chaos-BOUNDED smoke (first 5 steps ~2%, full run 15%). The precise
    systematic discriminators live elsewhere in this file: init-forward
    logits (2e-4), loss (1e-4), step-0 grads (1e-2 normalized), and the
    tight 50-step optimizer unit parity (TestOptimizerTorchParity, which
    is what actually caught the r5 amsgrad bias-correction bug)."""
    np.testing.assert_allclose(lj[:5], lt[:5], rtol=2e-2, atol=2e-2,
                               err_msg="early trajectory")
    np.testing.assert_allclose(lj, lt, rtol=1.5e-1, atol=1.5e-1,
                               err_msg="full trajectory (chaotic bound)")


def _map_conv_nobias(sd, tkey, jp):
    sd[f"{tkey}.weight"] = _t(np.transpose(jp["kernel"], (3, 2, 0, 1)))


def transplant_backbone(params, stats, stages):
    sd = {}
    _map_bn(sd, "input_norm", params["input_norm"], stats["input_norm"])
    tr, ts = params["trunk"], stats["trunk"]
    _map_conv_nobias(sd, "conv1", tr["conv1"])
    _map_bn(sd, "bn1", tr["bn1"], ts["bn1"])
    i = 0
    for stage, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            jb, js = (tr[f"stage{stage}_block{b}"],
                      ts[f"stage{stage}_block{b}"])
            pre = f"blocks.{i}"
            _map_conv_nobias(sd, f"{pre}.conv1", jb["conv1"])
            _map_bn(sd, f"{pre}.bn1", jb["bn1"], js["bn1"])
            _map_conv_nobias(sd, f"{pre}.conv2", jb["conv2"])
            _map_bn(sd, f"{pre}.bn2", jb["bn2"], js["bn2"])
            if "downsample" in jb:
                _map_conv_nobias(sd, f"{pre}.downsample", jb["downsample"])
                _map_bn(sd, f"{pre}.downsample_bn", jb["downsample_bn"],
                        js["downsample_bn"])
            i += 1
    h, hs = params["head"], stats["head"]
    _map_bn(sd, "output_transform.0", h["bn1"], hs["bn1"])
    _map_linear(sd, "output_transform.1", h["fc1"])
    _map_bn(sd, "output_transform.2", h["bn2"], hs["bn2"])
    sd["output_transform.3.weight"] = _t(h["prelu"]["alpha"])
    _map_linear(sd, "output_transform.5", h["fc2"])
    return sd


def _run_parity_backbone(n_steps=8, min_lr=1e-3, max_lr=3e-3):
    """CNNBackbone (resnet18) parity: third production family
    (reference classifiers.py:896-964)."""
    import jax
    import jax.numpy as jnp

    from freesound_classification_tpu.models.backbone import (
        CNNBackbone,
        RESNET_STAGES,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.parallel import mesh as mesh_lib
    from freesound_classification_tpu.training.engine import Engine

    stages = RESNET_STAGES["resnet18"]
    model = CNNBackbone(arch="resnet18", n_classes=N_CLASSES,
                        dtype=jnp.float32)
    frontend = Frontend(FEATURES, "2d", sr=SR, dft_precision="high")
    cfg = types.SimpleNamespace(
        optimizer="adam", learning_rate=1e-3,
        scheduler=f"1cycle_{min_lr}_{max_lr}", weight_decay=0.0,
        accumulation_steps=1, epochs=1,
        switch_off_augmentations_on=10**9, _save_every=10**9)
    engine = Engine(model, frontend, cfg, loss="lsep_naive", augment=None,
                    mesh=mesh_lib.make_mesh(1))
    engine.make_optimizer(max_steps=n_steps, steps_per_epoch=n_steps)
    batches = _batches(4, seed=2)
    engine.init_state(batches[0])
    params = jax.device_get(engine.state.params)
    stats = jax.device_get(engine.state.batch_stats)

    tmodel = TorchRefBackbone(stages, N_CLASSES)
    tmodel.load_state_dict(transplant_backbone(params, stats, stages),
                           strict=True)

    tmodel.eval()
    with torch.no_grad():
        tlogits0 = tmodel(torch.from_numpy(batches[0]["signal"])).numpy()
    db0, _ = engine._prep_batch(batches[0])
    inputs0, fl0 = engine.frontend(db0["signal"], db0["lengths"])
    jlogits0 = np.asarray(engine.model.apply(
        {"params": engine.state.params,
         "batch_stats": engine.state.batch_stats},
        inputs0, fl0, train=False)["class_logits"])
    np.testing.assert_allclose(jlogits0, tlogits0, atol=2e-4,
                               err_msg="backbone init eval-forward diverges")
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=min_lr, amsgrad=True)

    losses_j, losses_t = [], []
    for step in range(n_steps):
        batch = batches[step % len(batches)]
        lr = reference_onecycle_lr(min_lr, max_lr, n_steps, step)
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        tloss = torch_lsep_loss(
            tmodel(torch.from_numpy(batch["signal"])),
            torch.from_numpy(batch["labels"]))
        tloss.backward()
        opt.step()
        losses_t.append(float(tloss))

        db, n = engine._prep_batch(batch)
        partner = (db["signal"], db["lengths"], db["labels"])
        engine.state, out = engine._train_step(
            engine.state, db, 0.0, jnp.int32(n), partner)
        losses_j.append(float(out["loss"]))
    return np.asarray(losses_j), np.asarray(losses_t)


def _run_parity_ssl(kind, n_steps=8, min_lr=1e-3, max_lr=3e-3):
    """APC/CPC parity: the SSL train step (sum of loss_terms, adam-amsgrad,
    1cycle — reference apc.py:124-167 `loss = sum(losses)`) through the
    real self-supervised engine vs the torch twin on IDENTICAL feature
    frames."""
    import jax
    import jax.numpy as jnp

    from freesound_classification_tpu.models.apc import APCModel
    from freesound_classification_tpu.models.cpc import CPCModel
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.parallel import mesh as mesh_lib
    from freesound_classification_tpu.training.engine import Engine

    input_dim = N_FFT // 2 + 1
    if kind == "apc":
        model = APCModel(rnn_size=32, rnn_layers=3, prediction_steps=3,
                         dtype=jnp.float32)
    else:
        model = CPCModel(n_encoder_layers=3, conv_base_depth=8,
                         growth_rate=2.0, context_size=32,
                         prediction_steps=2, dtype=jnp.float32)
    frontend = Frontend(FEATURES, "1d", sr=SR, dft_precision="high")
    cfg = types.SimpleNamespace(
        optimizer="adam", learning_rate=1e-3,
        scheduler=f"1cycle_{min_lr}_{max_lr}", weight_decay=0.0,
        accumulation_steps=1, epochs=1,
        switch_off_augmentations_on=10**9, _save_every=10**9)
    engine = Engine(model, frontend, cfg, loss="lsep_naive", augment=None,
                    mesh=mesh_lib.make_mesh(1), self_supervised=True)
    engine.make_optimizer(max_steps=n_steps, steps_per_epoch=n_steps)
    batches = _batches(4, seed=3)
    engine.init_state(batches[0])
    params = jax.device_get(engine.state.params)
    stats = jax.device_get(engine.state.batch_stats)

    if kind == "apc":
        tmodel = TorchRefAPC(input_dim, 32, 3, 3)
        tmodel.load_state_dict(transplant_apc(params, 3), strict=True)
    else:
        tmodel = TorchTwinCPC(input_dim, 3, 8, 2.0, 32, 2)
        tmodel.load_state_dict(transplant_cpc(params, stats, 3),
                               strict=True)
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=min_lr, amsgrad=True)

    # identical feature frames on both sides (the frontend is the
    # classifier harnesses' parity surface)
    feats_np = {}
    for i, b in enumerate(batches):
        x, _ = frontend(jnp.asarray(b["signal"]),
                        jnp.asarray(b["lengths"]))
        feats_np[i] = np.asarray(x, np.float32)

    losses_j, losses_t = [], []
    for step in range(n_steps):
        i = step % len(batches)
        batch = batches[i]
        lr = reference_onecycle_lr(min_lr, max_lr, n_steps, step)
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        tloss = sum(tmodel(torch.from_numpy(feats_np[i])))
        tloss.backward()
        opt.step()
        losses_t.append(float(tloss))

        db, n = engine._prep_batch(batch)
        partner = (db["signal"], db["lengths"], db.get("labels"))
        engine.state, out = engine._train_step(
            engine.state, db, 0.0, jnp.int32(n), partner)
        losses_j.append(float(out["loss"]))
    return np.asarray(losses_j), np.asarray(losses_t)


def _run_parity_hier(n_steps=10, min_lr=1e-3, max_lr=3e-3):
    """HierarchicalCNN (1d tower) parity: same harness as _run_parity but
    for the second production family (reference classifiers.py:107-217)."""
    import jax
    import jax.numpy as jnp

    lr_desc = f"1cycle_{min_lr}_{max_lr}"
    engine = _build_engine("max", lr_desc, 0.0, n_steps, family="1d")
    batches = _batches(4, seed=1)
    engine.init_state(batches[0])
    params = jax.device_get(engine.state.params)
    stats = jax.device_get(engine.state.batch_stats)

    input_dim = N_FFT // 2 + 1
    tmodel = TorchRefHierCNN(3, 1, 8, 2.0, N_CLASSES, input_dim)
    tmodel.load_state_dict(transplant_hier(params, stats, 3), strict=True)

    # init eval-forward parity
    tmodel.eval()
    with torch.no_grad():
        tlogits0 = tmodel(torch.from_numpy(batches[0]["signal"])).numpy()
    db0, _ = engine._prep_batch(batches[0])
    inputs0, fl0 = engine.frontend(db0["signal"], db0["lengths"])
    jlogits0 = np.asarray(engine.model.apply(
        {"params": engine.state.params,
         "batch_stats": engine.state.batch_stats},
        inputs0, fl0, train=False)["class_logits"])
    np.testing.assert_allclose(jlogits0, tlogits0, atol=2e-4,
                               err_msg="hier init eval-forward diverges")
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=min_lr, amsgrad=True)

    losses_j, losses_t = [], []
    for step in range(n_steps):
        batch = batches[step % len(batches)]
        lr = reference_onecycle_lr(min_lr, max_lr, n_steps, step)
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        tloss = torch_lsep_loss(
            tmodel(torch.from_numpy(batch["signal"])),
            torch.from_numpy(batch["labels"]))
        tloss.backward()
        opt.step()
        losses_t.append(float(tloss))

        db, n = engine._prep_batch(batch)
        partner = (db["signal"], db["lengths"], db["labels"])
        engine.state, out = engine._train_step(
            engine.state, db, 0.0, jnp.int32(n), partner)
        losses_j.append(float(out["loss"]))
    return np.asarray(losses_j), np.asarray(losses_t)


class TestOptimizerTorchParity:
    """50 deterministic steps on a smooth toy objective: our optax chains
    must track torch.optim to f32 round-off. This is the tight optimizer
    discriminator — it caught optax.scale_by_amsgrad maxing the bias-
    CORRECTED second moment (max param divergence 0.128 after 50 steps
    vs torch; the torch-parity transform in training/optimizers.py
    lands at ~4e-6)."""

    def _run(self, optimizer_name, weight_decay, torch_factory):
        import jax
        import jax.numpy as jnp

        from freesound_classification_tpu.training.optimizers import (
            make_optimizer,
        )

        rng = np.random.RandomState(0)
        W0 = rng.randn(6, 6).astype(np.float32)
        A = rng.randn(6, 6).astype(np.float32)

        tx = make_optimizer(optimizer_name, lambda s: 1e-2,
                            weight_decay=weight_decay)
        w, st = jnp.asarray(W0), None
        st = tx.init(w)

        def loss_j(w):
            return (jnp.sum(jnp.tanh(w @ jnp.asarray(A)) ** 2)
                    + 0.1 * jnp.sum(jnp.sin(w)))

        for _ in range(50):
            g = jax.grad(loss_j)(w)
            up, st = tx.update(g, st, w)
            w = w + up

        wt = torch.tensor(W0, requires_grad=True)
        opt = torch_factory([wt])
        At = torch.tensor(A)
        for _ in range(50):
            opt.zero_grad()
            ((torch.tanh(wt @ At) ** 2).sum()
             + 0.1 * torch.sin(wt).sum()).backward()
            opt.step()
        return np.asarray(w), wt.detach().numpy()

    def test_adam_amsgrad(self):
        j, t = self._run(
            "adam", 0.0,
            lambda p: torch.optim.Adam(p, lr=1e-2, amsgrad=True))
        np.testing.assert_allclose(j, t, atol=2e-5)

    def test_adam_amsgrad_coupled_weight_decay(self):
        j, t = self._run(
            "adam", 1e-3,
            lambda p: torch.optim.Adam(p, lr=1e-2, amsgrad=True,
                                       weight_decay=1e-3))
        np.testing.assert_allclose(j, t, atol=2e-5)

    def test_sgd_nesterov(self):
        j, t = self._run(
            "momentum", 1e-3,
            lambda p: torch.optim.SGD(p, lr=1e-2, momentum=0.9,
                                      nesterov=True, weight_decay=1e-3))
        np.testing.assert_allclose(j, t, atol=2e-5)


class TestReferenceStepParity:
    def test_max_aggregation_trajectory(self):
        lj, lt = _run_parity("max", weight_decay=0.0)
        _assert_trajectory(lj, lt)

    def test_max_aggregation_with_coupled_weight_decay(self):
        lj, lt = _run_parity("max", weight_decay=1e-3, n_steps=10)
        _assert_trajectory(lj, lt)

    def test_rnn_aggregation_trajectory(self):
        lj, lt = _run_parity("rnn", weight_decay=0.0, n_steps=12)
        _assert_trajectory(lj, lt)

    def test_hierarchical_family_trajectory(self):
        lj, lt = _run_parity_hier(n_steps=10)
        _assert_trajectory(lj, lt)

    def test_apc_family_trajectory(self):
        lj, lt = _run_parity_ssl("apc", n_steps=8)
        _assert_trajectory(lj, lt)

    def test_cpc_family_trajectory(self):
        lj, lt = _run_parity_ssl("cpc", n_steps=8)
        _assert_trajectory(lj, lt)

    def test_backbone_family_trajectory(self):
        """resnet18 is ~3x deeper in BN/conv stages than the other
        families, so the same per-step backend noise doubles faster —
        tight window 3 steps (step 0 matches to 2e-6, the init forward to
        2e-4), chaos bound 25% over 8."""
        lj, lt = _run_parity_backbone(n_steps=8)
        np.testing.assert_allclose(lj[:3], lt[:3], rtol=2e-2, atol=2e-2,
                                   err_msg="early trajectory")
        np.testing.assert_allclose(lj, lt, rtol=2.5e-1, atol=2.5e-1,
                                   err_msg="full trajectory (chaotic bound)")

    def test_1cycle_schedule_matches_reference_shape(self):
        from freesound_classification_tpu.ops.schedules import (
            onecycle_schedule,
        )

        for max_steps in (10, 100, 333):
            sched = onecycle_schedule(1e-4, 3e-3, max_steps)
            ours = np.asarray([float(sched(t)) for t in range(max_steps)])
            ref = np.asarray([
                reference_onecycle_lr(1e-4, 3e-3, max_steps, t)
                for t in range(max_steps)
            ])
            # ours evaluates in f32 inside the compiled step; the torch
            # reference mutates param groups in f64 — f32 rtol
            np.testing.assert_allclose(ours, ref, rtol=1e-5,
                                       err_msg=f"max_steps={max_steps}")
