"""Root-level evaluation entry point (reference: test_net.py:9-44).

Forwards to the single implementation in tools/test.py (the reference
ships both a root and a tools/ copy, SURVEY §2.1).
"""

from tools.test import main

if __name__ == "__main__":
    main()
