"""Reference-compatible command-line entry points.

``python -m tpu_ac.cli.main``  — compute & pickle (alpha, X) per category
                                 (examples/main.py equivalent).
``python -m tpu_ac.cli.evaluate`` — clustering + metrics + tau-sweep CSV
                                 (examples/test.py equivalent).
"""
