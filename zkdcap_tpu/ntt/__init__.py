from .ntt import Domain, intt, ntt
