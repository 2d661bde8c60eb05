"""``python -m rayzath_tpu`` — headless CLI (reference Application/main.cpp)."""
from .headless import main

raise SystemExit(main())
