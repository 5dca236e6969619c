// Shim sdsl/rank_support.hpp: rank_support_il<1> over the shim
// bit_vector_il.  rank(i) = number of set bits in [0, i) — the sdsl
// semantics the reference relies on to index the dense ID array
// (MIBloomFilter.hpp:203,229,348,374,453).
#ifndef SHIM_SDSL_RANK_SUPPORT_HPP
#define SHIM_SDSL_RANK_SUPPORT_HPP

#include "bit_vector_il.hpp"

#include <cstdint>
#include <vector>

namespace sdsl {

template<uint8_t t_b = 1>
class rank_support_il
{
public:
  rank_support_il() = default;

  explicit rank_support_il(const bit_vector_il<512>* bv)
    : m_bv(bv)
  {
    const auto& w = bv->words();
    m_cum.resize(w.size() + 1, 0);
    for (size_t i = 0; i < w.size(); ++i) {
      m_cum[i + 1] = m_cum[i] + (uint64_t)__builtin_popcountll(w[i]);
    }
  }

  uint64_t operator()(size_t i) const
  {
    const auto& w = m_bv->words();
    size_t word = i >> 6;
    uint64_t below = (i & 63) ? (w[word] & ((1ULL << (i & 63)) - 1)) : 0;
    return m_cum[word] + (uint64_t)__builtin_popcountll(below);
  }

private:
  const bit_vector_il<512>* m_bv = nullptr;
  std::vector<uint64_t> m_cum;
};

} // namespace sdsl

#endif
