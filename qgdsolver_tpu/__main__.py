"""`python -m qgdsolver_tpu <case_dir>` — the solver-executable surface."""
from .cli import main

raise SystemExit(main())
