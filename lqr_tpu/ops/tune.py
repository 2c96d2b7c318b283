"""The ONE kernel-tuning surface (VERDICT r4 weak #6).

Every Pallas-kernel experiment knob lives in this frozen dataclass, read
from the environment EXACTLY ONCE at import.  Rationale (ADVICE r3 #4): a
trace-time env read inside a jitted kernel does not key the jit cache, so
flipping a knob mid-process silently runs stale kernels; import-time
freezing makes the single-shot semantics explicit.  Flip knobs by
restarting the process (or re-importing in a fresh interpreter).

Defaults are the measured v5e optima (round 3-4 A/B results recorded in
the owning modules' docstrings).  The knobs exist for perf archaeology
and regression bisection — production code never needs to set any.

| env var              | field               | default | meaning        |
|----------------------|---------------------|---------|----------------|
| LQR_FWD_WEDGE        | fwd_wedge           | 1       | roll-free wedge
|                      |                     |         | forward DP     |
| LQR_FWD_WEDGE_K      | fwd_kw              | 4       | wedge band,    |
|                      |                     |         | streamed fwd   |
| LQR_BT_WEDGE         | bt_wedge            | 1       | roll-free wedge
|                      |                     |         | backtrack      |
| LQR_BT_WEDGE_K       | bt_kw               | 2       | wedge band,    |
|                      |                     |         | streamed BT    |
| LQR_BT_WEDGE_K_RES   | bt_kw_res           | 4       | wedge band,    |
|                      |                     |         | resident BT    |
| LQR_WEDGE_K          | wedge_k             | 4       | wedge band,    |
|                      |                     |         | resident fwd   |
| LQR_DP_CHUNK         | dp_chunk            | (auto)  | rows/unrolled  |
|                      |                     |         | chunk          |
| LQR_BP_I32           | bp_i32              | 0       | i32 backptrs   |
| LQR_RESIDENT_FWD_ONLY| resident_fwd_only   | 0       | ablation: skip |
|                      |                     |         | BT+compact     |
| LQR_RESIDENT_NO_BP   | resident_no_bp      | 0       | ablation: no bp|
|                      |                     |         | stores         |
| LQR_RESIDENT_NO_ENERGY| resident_no_energy | 0       | ablation: e:=b |

``LQR_PALLAS_INTERPRET`` is NOT here: interpreter mode must stay a
dynamic read (``dp_pallas._interpret``) because CPU test modules enable
it after other modules already imported the kernels.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class Tune:
    fwd_wedge: bool
    fwd_kw: int
    bt_wedge: bool
    bt_kw: int
    bt_kw_res: int
    wedge_k: int
    dp_chunk: int | None
    bp_i32: bool
    resident_fwd_only: bool
    resident_no_bp: bool
    resident_no_energy: bool


def _from_env() -> Tune:
    env = os.environ.get
    chunk = env("LQR_DP_CHUNK")
    return Tune(
        fwd_wedge=env("LQR_FWD_WEDGE", "1") != "0",
        fwd_kw=int(env("LQR_FWD_WEDGE_K", "4")),
        bt_wedge=env("LQR_BT_WEDGE", "1") != "0",
        bt_kw=int(env("LQR_BT_WEDGE_K", "2")),
        bt_kw_res=int(env("LQR_BT_WEDGE_K_RES", "4")),
        wedge_k=int(env("LQR_WEDGE_K", "4")),
        dp_chunk=int(chunk) if chunk else None,
        bp_i32=env("LQR_BP_I32") == "1",
        resident_fwd_only=bool(env("LQR_RESIDENT_FWD_ONLY")),
        resident_no_bp=bool(env("LQR_RESIDENT_NO_BP")),
        resident_no_energy=bool(env("LQR_RESIDENT_NO_ENERGY")),
    )


TUNE = _from_env()
