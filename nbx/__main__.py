"""nbx command-line interface.

    python -m nbx serve [--port 8000] [--scenario galaxy]
    python -m nbx demo galaxy|merger [args...]
    python -m nbx bench throughput|drift|latency [args...]
    python -m nbx run --scenario galaxy --frames 500 --out traj.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="nbx", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="live interactive viewer server")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument(
        "--host",
        default="127.0.0.1",
        help="bind address; endpoints are unauthenticated, pass 0.0.0.0 "
        "only to expose deliberately",
    )
    s.add_argument("--scenario", default="galaxy")
    s.add_argument("--width", type=int, default=640)
    s.add_argument("--height", type=int, default=360)

    d = sub.add_parser("demo", help="render a demo scene to PNG frames")
    d.add_argument("which", choices=["galaxy", "merger"])
    d.add_argument("args", nargs="*")

    b = sub.add_parser("bench", help="benchmarks")
    b.add_argument("which", choices=["throughput", "drift", "latency"])
    b.add_argument("args", nargs="*")

    r = sub.add_parser("run", help="headless run with checkpointing")
    r.add_argument("--scenario", default="galaxy")
    r.add_argument("--frames", type=int, default=500)
    r.add_argument("--checkpoint", default="nbx_checkpoint.npz")
    r.add_argument("--every", type=int, default=100)
    r.add_argument("--capacity", type=int, default=300)

    a = p.parse_args(argv)

    if a.cmd == "serve":
        from nbx.serve import serve

        serve(a.port, scenario=a.scenario, width=a.width, height=a.height,
              host=a.host)
    elif a.cmd == "demo":
        if a.which == "galaxy":
            from examples.galaxy_demo import main as demo

            demo(*[int(x) if x.isdigit() else x for x in a.args])
        else:
            from examples.merger_demo import main as demo

            demo(*[int(x) if x.isdigit() else x for x in a.args])
    elif a.cmd == "bench":
        mod = {
            "throughput": "nbx.bench.throughput",
            "drift": "nbx.bench.drift",
            "latency": "nbx.bench.latency",
        }[a.which]
        import importlib

        importlib.import_module(mod).main(
            *[int(x) if x.isdigit() else x for x in a.args]
        )
    elif a.cmd == "run":
        from nbx.config import SimConfig
        from nbx.interactive import Simulation

        sim = Simulation(SimConfig(capacity=a.capacity), scenario=a.scenario)
        sim.run_checkpointed(a.frames, a.checkpoint, a.every)
        d = sim.measure()
        print(
            f"{a.frames} frames done; alive={d.n_alive} "
            f"E={float(d.kinetic + d.potential):.3f} -> {a.checkpoint}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
