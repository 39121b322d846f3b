"""Communication-profile diagnostics for sharded programs.

The reference has no distributed layer at all (SURVEY.md §2: its only
parallelism is OpenMP shared memory), so the scaling story here is
green-field design — and the way to *verify* that design without a pod is
structural: compile the sharded program and count the collectives XLA
inserted. The contract this framework is built around:

- ``sharded_register_batch``: ZERO collectives. Registration is
  embarrassingly parallel over the ``('pairs',)`` mesh axis; weak scaling
  on real hardware is communication-free by construction, so efficiency
  at N chips is bounded by dispatch overheads, not ICI bandwidth.
- ``make_loop_closing_step``: all-reduce only (the pose-graph Gauss-Newton
  / CG inner products psum over the pairs axis), no all-gathers of
  point-cloud-sized tensors — the only cross-chip traffic is
  pose-vector-sized.

``tests/test_parallel.py`` pins this profile so a refactor that silently
introduces resharding (e.g. an accidental replicated-output constraint)
fails CI instead of shipping a 100x comm regression.
"""

from __future__ import annotations

import re
from collections import Counter

import jax

# Matches an opcode POSITION only: the opcode in HLO text is immediately
# followed by its '(' operand list. Instruction names echo the opcode but
# are '%'-prefixed and suffixed ('.1 = ' or ')' as an operand reference),
# so the negative lookbehind + required '(' exclude them; '-done' halves of
# async pairs never match (no '-done' alternative), so a start/done pair
# counts exactly once.
_COLLECTIVE_RE = re.compile(
    r"(?<![%\w-])(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all|collective-broadcast)(?:-start)?\(")


def collective_profile(fn, *args, static_argnums=()) -> Counter:
    """Compile ``fn(*args)`` and count collective ops in the optimized HLO.

    Returns a Counter keyed by HLO op name ('all-reduce', ...). Counts are
    once per logical op: static occurrences in the compiled module (an op
    inside a while-loop body counts once, regardless of trip count), with
    async start/done pairs counted once and name/operand echoes of the
    opcode in the HLO text ignored.
    """
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(
        *args).compile()
    return Counter(_COLLECTIVE_RE.findall(compiled.as_text()))
