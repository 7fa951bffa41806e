# -*- coding: utf-8 -*-
"""Native C++ tokenizer: byte-identical to the Python reference parser on
every dialect fixture (the Python parser is the semantics oracle)."""
import glob

import numpy as np
import pytest

from mcsas_tpu.io import native
from mcsas_tpu.io.ascii import load_ascii, read_array, read_text_lines

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native parser not built")


def test_all_fixtures_match_python(refdata):
    checked = 0
    for fn in sorted(glob.glob(str(refdata / "*"))):
        try:
            py = read_array(read_text_lines(fn), filename=fn)
        except Exception:
            continue
        nat = load_ascii(fn, use_native=True)
        np.testing.assert_array_equal(nat, py, err_msg=fn)
        checked += 1
    assert checked >= 15


def test_parse_text_direct():
    arr = native.parse_text("header\n1,5 2,5\n1.0;2.0\n")
    # decimal-comma line then point line: both 2 columns
    np.testing.assert_array_equal(arr, [[1.5, 2.5], [1.0, 2.0]])


def test_parse_text_footer_stops():
    arr = native.parse_text("1 2\n3 4\nfooter\n5 6\n")
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])


def test_parse_text_column_change_stops():
    arr = native.parse_text("1 2\n3 4\n5 6 7\n")
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])


def test_parse_text_blank_lines_skipped():
    arr = native.parse_text("\n\n1 2\n\n3 4\n")
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])


def test_parse_text_skip_lines():
    arr = native.parse_text("9 9\n8 8\n1 2\n", skip_lines=2)
    np.testing.assert_array_equal(arr, [[1, 2]])


def test_parse_text_no_data():
    assert native.parse_text("just words\n") is None


def test_cr_only_endings():
    arr = native.parse_text("1;2\r3;4\r")
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])
