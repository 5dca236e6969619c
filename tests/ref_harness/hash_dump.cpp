// Dump the reference hashing stack's output for one sequence: runs the REAL
// multiLensfrHashIterator (multiLensfrHashIterator.hpp, compiled from
// /root/reference) over the shim SeedNtHash and prints one line per frame:
// h space-separated uint64 hashes.  Used by test_ref_parity.py to check the
// JAX/NumPy hash kernels against the compiled reference iterator (lockstep
// advance + stale-tail semantics included).
//
// Usage: hash_dump <seq> <seed1> [<seed2> ...]
#include "multiLensfrHashIterator.hpp"

#include <iostream>
#include <string>
#include <vector>

int
main(int argc, char** argv)
{
  if (argc < 3) {
    std::cerr << "usage: hash_dump <seq> <seed...>" << std::endl;
    return 1;
  }
  std::string seq(argv[1]);
  std::vector<std::string> seeds;
  for (int i = 2; i < argc; ++i) {
    seeds.emplace_back(argv[i]);
  }
  multiLensfrHashIterator itr(seq, seeds);
  while (itr != itr.end()) {
    for (size_t s = 0; s < seeds.size(); ++s) {
      if (s) {
        std::cout << ' ';
      }
      std::cout << (*itr)[s];
    }
    std::cout << '\n';
    ++itr;
  }
  return 0;
}
