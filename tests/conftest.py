import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TEST_FILES = "/root/reference/test_files"


def fixture_path(name: str) -> str:
    return os.path.join(TEST_FILES, name)
