"""Import the (read-only) torch reference as a CPU test oracle.

We patch .cuda() to a no-op so the reference loss code runs on CPU. This is
used ONLY to verify numerical parity in tests; no reference code ships in the
package.
"""
import sys

REF = "/root/reference"


def load_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    # neutralize .cuda() so reference loss code runs on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    return True
