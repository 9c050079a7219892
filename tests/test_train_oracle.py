"""ONE-TRAIN-STEP oracle against the ACTUAL reference trainer semantics.

The eval-forward oracle (test_reference_parity.py) cannot see training-only
semantics. This test builds the reference WeatherNet-RN18 + the reference
ADAM optimizer (two param groups: ``random_init_params`` @ lr/wd and
``fine_tune_params`` @ lr/4, wd/4, betas (0.9, 0.99) —
``utils/init_trainer.py:160-177``), runs REAL ``loss.backward(); step()``
iterations of the published recipe's seg branch (``trainer.py:199-203,
212-214``), and demands that our jitted ``train_step`` — starting from the
identical imported checkpoint and fed identical batches — lands on the same
parameters AND BatchNorm running statistics after 1 and after 5 steps.

This pins, all at once:
- BN train-mode semantics: momentum 0.1, normalization by biased batch var,
  running_var updated with the UNBIASED var (torch ``_BatchNorm``; our
  ``TorchBatchNorm`` exists because flax folds the biased one),
- torch Adam's L2-into-gradient weight decay (NOT AdamW) and bias
  correction, via optax add_decayed_weights→scale_by_adam ordering,
- the lr/4, wd/4 fine-tune group fan-out over exactly the reference's
  parameter partition — including that the reference NEVER optimizes the seg
  head under ADAM (``weathernet.py:100-102`` drops ``self.segmentation`` from
  ``random_init_params``; asserted against the torch run below),
- gradient flow through the frozen projection head into the trunk
  (supcon case), with the head itself unchanged on both sides.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "network")),
    reason="reference repo not available")

B, H, W, C = 2, 128, 128, 19
LR, WD = 4e-4, 1e-4  # the published recipe (scripts/train_weather.sh)


def _batches(n_steps, seed=0, two_view=False):
    out = []
    for i in range(n_steps):
        rng = np.random.default_rng(seed + i)
        n_img = 2 * B if two_view else B
        x = rng.uniform(0, 255, (n_img, 3, H, W)).astype(np.float32)
        labels = rng.integers(0, C, (B, H, W)).astype(np.int64)
        labels[:, :8, :8] = 255
        alphas = rng.uniform(0.05, 1.0, (B, H, W)).astype(np.float32)
        alphas[labels == 255] = 0.0
        weather = rng.integers(0, 4, (B,)).astype(np.int64)
        out.append({"x": x, "labels": labels, "alphas": alphas,
                    "weather": weather})
    return out


@pytest.fixture(scope="module")
def class_weight():
    return np.random.default_rng(42).uniform(0.5, 2.0, (C,)).astype(np.float32)


def _run_reference(batches, class_weight, criterion="none", snapshot_at=(1, 5),
                   policy="ADAM"):
    """Torch-CPU reference: model + criterion + the reference optimizer
    (two-group Adam, or the 4-named-group SGD of ``init_trainer.py:127-159``),
    real steps.

    Returns {step: state_dict-ckpt-path-content}, plus the supcon head
    weights used (for the supcon criterion)."""
    from test_reference_parity import (_install_torchvision_stubs,
                                       build_reference_weathernet)

    model = build_reference_weathernet()
    model.train()

    _install_torchvision_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        import utils.loss as ref_loss
        import utils.utils as ref_utils
    finally:
        sys.path.remove(REFERENCE)

    import types

    opts = types.SimpleNamespace(criterion=criterion, no_class_weights=False,
                                 no_EDT=False, with_depth_level_loss=False,
                                 deeplab=False)
    w256 = torch.tensor(np.concatenate([class_weight, [0.0] * 237]))
    crit = ref_loss.BoundaryAwareFocalLoss(
        gamma=0.5, num_classes=C, ignore_id=255, weight=w256, device="cpu",
        opts=opts)
    supcon_crit = None
    if "supcon" in criterion:
        torch.manual_seed(123)
        supcon_crit = ref_loss.SupConLoss(
            temperature=0.07, contrast_mode="all", base_temperature=0.07,
            weight=w256, device="cpu", opts=opts)

    if policy == "ADAM":
        # init_trainer.py:160-177: ADAM, two groups, betas (0.9, 0.99)
        opt = torch.optim.Adam(
            [{"params": list(model.random_init_params()), "lr": LR,
              "weight_decay": WD},
             {"params": list(model.fine_tune_params()), "lr": LR / 4,
              "weight_decay": WD / 4}],
            betas=(0.9, 0.99))
    else:
        # init_trainer.py:127-159: SGD over the REFERENCE'S OWN name-substring
        # filters (utils/utils.py:47-75) — the actual functions, not a
        # re-derivation. For WeatherNet: specific (offset_conv) and base are
        # EMPTY, feature_extractor is the whole backbone at lr x 1, the seg
        # head joins at lr x 10 (train_semantic recipe).
        named = list(model.named_parameters())
        groups = [
            {"params": [kv[1] for kv in filter(ref_utils.filter_base_params, named)],
             "lr": LR},
            {"params": [kv[1] for kv in filter(ref_utils.filter_specific_params, named)],
             "lr": LR * 0.1},
            {"params": [kv[1] for kv in filter(ref_utils.filter_feature_extractor_params, named)],
             "lr": LR},
            {"params": [kv[1] for kv in filter(ref_utils.filter_semantic_params, named)],
             "lr": LR * 10},
        ]
        assert len(groups[0]["params"]) == 0 and len(groups[1]["params"]) == 0
        opt = torch.optim.SGD(groups, lr=LR, momentum=0.9, weight_decay=WD)

    head_before = {k: v.detach().clone()
                   for k, v in model.segmentation.state_dict().items()
                   if "running" not in k and "num_batches" not in k}

    snaps = {0: {k: v.detach().clone().numpy()
                 for k, v in model.state_dict().items()}}
    for i, b in enumerate(batches):
        x = torch.tensor(b["x"])
        labels = torch.tensor(b["labels"])
        sample = {"label_distance_weight": torch.tensor(b["alphas"])}
        two_view = "supcon" in criterion

        left_seg, seg_beforeup, fine_feat, fine_feat0 = model(
            x, return_supcon_feature=two_view)
        seg_loss = crit(left_seg, labels.clone(), sample)
        if two_view:
            sup = supcon_crit(fine_feat,
                              class_labels=torch.tensor(b["weather"]),
                              mask=None)
            total = sup / B + 1.2 * seg_loss  # trainer.py:123
        else:
            total = seg_loss                  # trainer.py:199-203
        _REF_LOSSES[(criterion, policy, i)] = float(total.detach())
        opt.zero_grad()
        total.backward()
        opt.step()
        if (i + 1) in snapshot_at:
            snaps[i + 1] = {k: v.detach().clone().numpy()
                            for k, v in model.state_dict().items()}

    # the reference's ADAM recipe really does leave the seg head untouched;
    # the SGD recipe's lr x 10 semantic group really does move it
    head_moved = any(
        not np.array_equal(v.detach().numpy(), head_before[k].numpy())
        for k, v in model.segmentation.state_dict().items()
        if "running" not in k and "num_batches" not in k)
    assert head_moved == (policy == "SGD"), \
        f"{policy}: seg-head premise broken (moved={head_moved})"

    head_np = None
    if supcon_crit is not None:
        hsd = supcon_crit.projection.state_dict()
        head_np = {k: v.numpy() for k, v in hsd.items()}
    return snaps, head_np


_REF_LOSSES: dict = {}


def _ours_setup(snap0, tmp_path, criterion, head_np=None, policy="ADAM"):
    from doubly_contrastive_semseg_tpu.config import parse_args
    from doubly_contrastive_semseg_tpu.models import DCSSModel
    from doubly_contrastive_semseg_tpu.train.optimizer import build_optimizer
    from doubly_contrastive_semseg_tpu.train.state import TrainState
    from doubly_contrastive_semseg_tpu.train.steps import make_train_step
    from doubly_contrastive_semseg_tpu.utils import label_params_for_optimizer
    from doubly_contrastive_semseg_tpu.utils.torch_convert import load_pretrained

    cfg = parse_args([
        "--dataset", "synthetic", "--model", "resnet18", "--train_semantic",
        "--criterion", criterion, "--batch_size", str(B),
        "--compute_dtype", "float32", "--no_use_balanced_weights",
        "--lr", str(LR), "--weight_decay", str(WD), "--epochs", "400",
        "--optimizer_policy", policy,
    ])
    model = DCSSModel(backbone="resnet18", num_classes=C, weather_num=4,
                      dtype=jnp.float32)

    ckpt = str(tmp_path / "step0.pth")
    torch.save({"model_state": {k: torch.tensor(v)
                                for k, v in snap0.items()}}, ckpt)
    n_img = 2 * B if "supcon" in criterion else B
    x0 = jnp.zeros((n_img, H, W, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x0, train=False,
                   return_supcon_feature="supcon" in criterion)
    params, stats, n = load_pretrained(v["params"], v["batch_stats"], ckpt)
    assert n > 100

    if head_np is not None:
        # the reference hides the projection head inside SupConLoss; copy its
        # torch weights into our in-model (frozen) head
        proj = dict(params["projection"])
        proj["fc1"] = {"kernel": jnp.asarray(head_np["0.weight"].T),
                       "bias": jnp.asarray(head_np["0.bias"])}
        proj["fc2"] = {"kernel": jnp.asarray(head_np["2.weight"].T),
                       "bias": jnp.asarray(head_np["2.bias"])}
        params = dict(params)
        params["projection"] = proj

    labels = label_params_for_optimizer(params, cfg)
    tx = build_optimizer(cfg, labels, steps_per_epoch=10_000)  # epoch 0: lr=base
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=tx.init(params), step=0)
    return cfg, model, tx, state


def _import_snap(snap, model, tmp_path, template, head_np=None):
    """Torch state_dict snapshot → our pytree, via the production converter."""
    from doubly_contrastive_semseg_tpu.utils.torch_convert import load_pretrained

    p = str(tmp_path / "snap.pth")
    torch.save({"model_state": {k: torch.tensor(v) for k, v in snap.items()}}, p)
    params, stats, _ = load_pretrained(template["params"],
                                       template["batch_stats"], p)
    return params, stats


def _run_ours(cfg, model, tx, state, batches, class_weight):
    from doubly_contrastive_semseg_tpu.train.steps import make_train_step

    step_fn = make_train_step(model, cfg, tx)
    step_fn = jax.jit(step_fn)
    snaps, losses = {}, {}
    with jax.default_matmul_precision("highest"):
        for i, b in enumerate(batches):
            batch = {
                "left": jnp.asarray(np.transpose(b["x"], (0, 2, 3, 1))),
                "label": jnp.asarray(b["labels"]),
                "label_distance_weight": jnp.asarray(b["alphas"]),
                "weather": jnp.asarray(b["weather"]),
                "class_weight": jnp.asarray(class_weight),
            }
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
            snaps[i + 1] = state
            losses[i] = float(metrics["total_loss"])
    return snaps, losses


@pytest.mark.parametrize("criterion,n_steps", [("none", 5),
                                               ("supcon_focal", 2)])
def test_train_step_matches_reference(tmp_path, class_weight, criterion,
                                      n_steps):
    batches = _batches(n_steps, seed=7, two_view="supcon" in criterion)
    snapshot_at = (1, n_steps)
    ref_snaps, head_np = _run_reference(batches, class_weight,
                                        criterion=criterion,
                                        snapshot_at=snapshot_at)

    cfg, model, tx, state = _ours_setup(ref_snaps[0], tmp_path, criterion,
                                        head_np=head_np)
    template = {"params": state.params, "batch_stats": state.batch_stats}
    our_snaps, our_losses = _run_ours(cfg, model, tx, state, batches,
                                      class_weight)

    # the total loss itself is deterministic: f32-level agreement every step
    # (step > 0 losses are computed on already-diverged-by-noise params, so
    # the bar loosens slightly with depth)
    for i in range(n_steps):
        want = _REF_LOSSES[(criterion, "ADAM", i)]
        assert abs(our_losses[i] - want) / max(abs(want), 1.0) < 1e-4 * (i + 1), \
            f"[{criterion}] step {i}: loss {our_losses[i]:.6f} vs {want:.6f}"

    # Elementwise Adam-update comparison is noise-amplifying by construction:
    # the first-step update is lr*g/(|g|+eps) (≈ ±lr), so any element whose
    # true |g| is below the f32 cross-framework noise floor (~1e-7; the
    # random-init trunk's median |g| is only ~3e-6) lands a full ±lr apart.
    # The meaningful invariants are: frozen groups move EXACTLY zero, the
    # deviating-element population stays tiny (a wrong group lr / weight-decay
    # placement / momentum mapping shifts whole tensors), and BN running
    # stats — which are deterministic — agree to relative tolerance.
    for s in snapshot_at:
        want_p, want_bs = _import_snap(ref_snaps[s], model, tmp_path, template)
        got = our_snaps[s]

        diffs = []

        def visit(path, x, y):
            d = np.abs(np.asarray(x) - np.asarray(y))
            name = jax.tree_util.keystr(path)
            top = name.split("'")[1]
            if top in ("weather_clf", "projection") or "segmentation" in name:
                # frozen on both sides -> bit-exact
                assert d.max() == 0.0, \
                    f"[{criterion}] step {s}: frozen param moved: {name}"
            else:
                diffs.append(d.ravel())
            return x

        jax.tree_util.tree_map_with_path(visit, got.params, want_p)
        alld = np.concatenate(diffs)
        frac_big = float(np.mean(alld > 0.5 * LR * s))
        assert frac_big < 5e-3, \
            f"[{criterion}] step {s}: {frac_big:.2%} of elements deviate " \
            f"beyond half an lr-step (group lr/wd/momentum mismatch?)"
        assert float(np.mean(alld)) < 0.05 * LR * s, \
            f"[{criterion}] step {s}: mean deviation {np.mean(alld):.3e}"

        def visit_bs(path, x, y):
            xx, yy = np.asarray(x), np.asarray(y)
            rel = np.abs(xx - yy).max() / max(np.abs(yy).max(), 1e-2)
            # step-1 is the sharp check (params still identical): 2.5%
            # catches single-vs-double update (~5-20%), recompute ordering
            # (~4%), and biased-var (14% at the 2x2-spatial blend). Later
            # steps run on params already separated by Adam sign-noise, so the
            # bar scales with s.
            bar = 0.025 if s == 1 else 0.07 * s
            assert rel < bar, \
                f"[{criterion}] step {s}: BN stat rel dev {rel:.3e} at " \
                f"{jax.tree_util.keystr(path)}"
            return x

        jax.tree_util.tree_map_with_path(visit_bs, got.batch_stats, want_bs)


def test_cosine_schedule_matches_torch_per_group():
    """Value oracle for the LR schedule: torch ``CosineAnnealingLR`` reads
    each param group's own initial lr as the cosine ceiling but anneals every
    group to the SAME ``eta_min = last_lr = 1e-6`` (``init_trainer.py:301-306``,
    ``options.py:63``). The fine-tune group therefore runs lr/4 → 1e-6 — NOT
    (lr → 1e-6)/4, whose floor would be 4x too low and whose slope 0.75% off.
    Checked across all 400 epochs of the published recipe for both ADAM
    groups and the SGD x0.1/x10 groups."""
    from doubly_contrastive_semseg_tpu.train.optimizer import build_lr_schedule

    class _Cfg:
        lr = 4e-4
        last_lr = 1e-6
        epochs = 400
        lr_policy = "cos_annealing"

    epochs = 400
    for factor in (1.0, 0.25, 0.1, 10.0):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([{"params": [p], "lr": _Cfg.lr * factor}],
                              lr=_Cfg.lr)
        sched_t = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, epochs, eta_min=_Cfg.last_lr)
        ours = build_lr_schedule(_Cfg, steps_per_epoch=1,
                                 base_lr=_Cfg.lr * factor)
        for e in range(epochs + 1):
            want = opt.param_groups[0]["lr"]
            got = float(ours(e))
            assert abs(got - want) <= 1e-9 + 1e-5 * abs(want), \
                f"factor {factor} epoch {e}: {got:.3e} vs torch {want:.3e}"
            # torch's recursive closed-form stepping; advance after comparing
            opt.step()
            sched_t.step()


def test_sgd_train_step_matches_reference(tmp_path, class_weight):
    """SGD-policy oracle (the legacy recipes' optimizer). Pins, on top of the
    ADAM test above: the 4-named-group fan-out of ``init_trainer.py:127-159``
    — the ENTIRE feature_extractor (decoder included) at lr x 1, the seg head
    at lr x 10 via the 'semantic' group (so it MOVES here, unlike ADAM),
    momentum-0.9 buffers (decay-into-grad before the buffer, no dampening),
    and uniform optimizer-level weight decay.

    Unlike Adam — whose first-step update is sign(g)·lr and thus amplifies
    sub-noise gradients to ±lr — SGD's update is lr·(g + wd·p), proportional
    to the gradient itself, so elementwise parity is well-conditioned AT STEP
    ONE and the step-1 bounds are absolute and tight. Beyond step 1 the
    trajectory is chaotic through the stem (conv1 sits behind three shared
    pyramid-level BNs): a measured control — the torch reference vs a copy
    of itself perturbed by ±3e-6 — diverges to 4.8e-5 after one step and
    4.2e-4 after three, MORE than our cross-implementation deviation
    (3.2e-6 / 3.1e-4). Step-3 bounds are therefore a chaos envelope (max)
    plus a population bound (the chaos concentrates in conv1/layer4 tails;
    a systematic lr/wd/momentum error would move the whole population)."""
    n_steps = 3
    batches = _batches(n_steps, seed=19)
    snapshot_at = (1, n_steps)
    ref_snaps, _ = _run_reference(batches, class_weight, criterion="none",
                                  snapshot_at=snapshot_at, policy="SGD")

    cfg, model, tx, state = _ours_setup(ref_snaps[0], tmp_path, "none",
                                        policy="SGD")
    template = {"params": state.params, "batch_stats": state.batch_stats}
    our_snaps, our_losses = _run_ours(cfg, model, tx, state, batches,
                                      class_weight)

    for i in range(n_steps):
        want = _REF_LOSSES[("none", "SGD", i)]
        assert abs(our_losses[i] - want) / max(abs(want), 1.0) < 1e-4 * (i + 1), \
            f"[SGD] step {i}: loss {our_losses[i]:.6f} vs {want:.6f}"

    for s in snapshot_at:
        want_p, want_bs = _import_snap(ref_snaps[s], model, tmp_path, template)
        got = our_snaps[s]

        head_diffs, body_diffs = [], []

        def visit(path, x, y):
            d = np.abs(np.asarray(x) - np.asarray(y))
            name = jax.tree_util.keystr(path)
            top = name.split("'")[1]
            if top in ("weather_clf", "projection"):
                assert d.max() == 0.0, \
                    f"[SGD] step {s}: frozen param moved: {name}"
            elif "segmentation" in name:
                head_diffs.append(d.ravel())
            else:
                body_diffs.append(d.ravel())
            return x

        jax.tree_util.tree_map_with_path(visit, got.params, want_p)
        assert head_diffs, "seg head missing from comparison"
        # the head moved on the reference side (premise assert in
        # _run_reference); here it must land on the same values.
        # Bounds: step 1 tight (pins semantics exactly); later steps get the
        # measured chaos envelope (see docstring) — observed maxes 1.3e-4
        # (head) / 3.2e-4 (body, conv1) at step 3, torch-vs-perturbed-torch
        # control 4.2e-4 — plus a population bound: ≥99.9% of elements must
        # sit within the step-1-tight band, since chaos lives in the tails
        # while a systematic group-semantics error would shift everything.
        for which, diffs, bound in (("head", head_diffs,
                                     2e-5 if s == 1 else 1e-3),
                                    ("body", body_diffs,
                                     1e-5 if s == 1 else 1e-3)):
            alld = np.concatenate(diffs)
            assert float(alld.max()) < bound, \
                f"[SGD] step {s}: {which} max dev {alld.max():.3e} " \
                f"(group lr/momentum/wd mismatch?)"
            frac_tight = float((alld < 2e-5 * s).mean())
            assert frac_tight > 0.999, \
                f"[SGD] step {s}: {which} population shifted — only " \
                f"{frac_tight:.5f} within the tight band"

        def visit_bs(path, x, y):
            xx, yy = np.asarray(x), np.asarray(y)
            rel = np.abs(xx - yy).max() / max(np.abs(yy).max(), 1e-2)
            # batch moments of already-chaos-diverged activations: the
            # torch-vs-perturbed-torch control reaches 29% running-var rel
            # dev by step 3 (deep blend BNs); ours measures 17%
            bar = 0.025 if s == 1 else 0.3
            assert rel < bar, \
                f"[SGD] step {s}: BN stat rel dev {rel:.3e} at " \
                f"{jax.tree_util.keystr(path)}"
            return x

        jax.tree_util.tree_map_with_path(visit_bs, got.batch_stats, want_bs)


@pytest.mark.slow
def test_train_trajectory_envelope(tmp_path, class_weight):
    """25-step trajectory envelope on the focal branch: beyond ~5 steps,
    elementwise parity is gone by construction (Adam's first-step update is
    ±lr·g/(|g|+eps); sub-noise-floor gradients land a full ±lr apart and the
    param clouds separate chaotically) — but a wrong BN semantic, group
    fan-out, LR schedule, or weight-decay placement shifts the LOSS CURVE
    systematically, not stochastically. Assert per-step losses stay inside a
    geometrically-loosening envelope and both runs descend into the same
    neighbourhood: the strongest available proxy for the env-blocked
    ACDC-mIoU bar, on top of the exact 1/5-step oracle above."""
    n_steps = 25
    batches = _batches(n_steps, seed=11)
    ref_snaps, _ = _run_reference(batches, class_weight, criterion="none",
                                  snapshot_at=(n_steps,))

    cfg, model, tx, state = _ours_setup(ref_snaps[0], tmp_path, "none")
    _, our_losses = _run_ours(cfg, model, tx, state, batches, class_weight)

    ref = np.array([_REF_LOSSES[("none", "ADAM", i)] for i in range(n_steps)])
    ours = np.array([our_losses[i] for i in range(n_steps)])
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1.0)

    # per-step envelope: f32-exact at step 0, loosening geometrically with
    # the accumulated Adam sign-noise; systematically-wrong semantics
    # (single-vs-double BN update, missing lr/4 group, AdamW-style decay)
    # blow through this within a few steps
    env = 1e-4 * (1.6 ** np.arange(n_steps))
    bad = np.nonzero(rel > np.maximum(env, 0.0))[0]
    assert bad.size == 0, (
        f"loss left the envelope at steps {bad.tolist()}: "
        f"rel={rel[bad].round(5).tolist()} "
        f"(ref={ref[bad].round(4).tolist()}, ours={ours[bad].round(4).tolist()})")

    # same descent neighbourhood: tail means agree within 5%, and both
    # descended by a comparable factor
    tail_ref, tail_ours = ref[-5:].mean(), ours[-5:].mean()
    assert abs(tail_ours - tail_ref) / tail_ref < 0.05, \
        f"tail loss {tail_ours:.4f} vs reference {tail_ref:.4f}"
    drop_ref = ref[0] / tail_ref
    drop_ours = ours[0] / tail_ours
    assert abs(drop_ours - drop_ref) / drop_ref < 0.05, \
        f"descent factor {drop_ours:.3f} vs reference {drop_ref:.3f}"
