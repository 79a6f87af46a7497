"""The examples/ scripts are self-checking (each asserts and prints PASS);
run the fast ones as part of the suite so they stay green."""

import os
import runpy

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize('script', [
    'hhl.py',
    'state_transfer_1d.py',
    'mbqc_basic_gates.py',
    'unitary_mapper.py',
])
def test_example_runs(script, capsys):
    runpy.run_path(os.path.join(_HERE, 'examples', script), run_name='__main__')
    assert 'PASS' in capsys.readouterr().out
