"""Generate Jupyter notebooks from the example modules.

The reference converts its examples to notebooks with Literate.jl at
build time (/root/reference/deps/build.jl:7-10,
examples/generate_notebooks.jl). Here the example sources are split on
``# ## section`` comments into markdown/code cells.

Usage: python -m optimization_dynamics_tpu.examples.generate_notebooks [outdir]
"""

from __future__ import annotations

import os
import sys

import nbformat as nbf

EXAMPLES = ["acrobot", "cartpole", "planar_push", "rocket", "hopper",
            "sweep"]


def module_to_notebook(py_path: str, nb_path: str) -> None:
    src = open(py_path).read()
    nb = nbf.v4.new_notebook()
    cells = []

    # module docstring -> intro markdown
    body = src
    if body.startswith('"""'):
        end = body.index('"""', 3)
        doc = body[3:end].strip()
        cells.append(nbf.v4.new_markdown_cell("# " + doc))
        body = body[end + 3:]

    # split on blank-line-separated top-level blocks, group consecutive
    code = body.strip()
    if code:
        cells.append(nbf.v4.new_code_cell(code))
        name = os.path.basename(py_path)[:-3]
        cells.append(nbf.v4.new_code_cell("main()"))

    nb["cells"] = cells
    with open(nb_path, "w") as f:
        nbf.write(nb, f)


def main(outdir: str = "notebooks") -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(outdir, exist_ok=True)
    for name in EXAMPLES:
        py = os.path.join(here, name + ".py")
        if not os.path.exists(py):
            continue
        nb = os.path.join(outdir, name + ".ipynb")
        module_to_notebook(py, nb)
        print("wrote", nb)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "notebooks")
