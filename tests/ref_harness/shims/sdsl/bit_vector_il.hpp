// Shim sdsl/bit_vector_il.hpp: semantically a plain bit vector (the
// interleaving in real sdsl is a cache layout detail; rank semantics are
// identical).  API used: construction from sdsl::bit_vector, size(),
// operator[], default-construct + assign (MIBFConstructSupport.hpp:165-170,
// MIBloomFilter.hpp:340-459).
#ifndef SHIM_SDSL_BIT_VECTOR_IL_HPP
#define SHIM_SDSL_BIT_VECTOR_IL_HPP

#include "int_vector.hpp"

#include <cstdint>
#include <vector>

namespace sdsl {

template<uint32_t BLOCKSIZE = 512>
class bit_vector_il
{
public:
  bit_vector_il() = default;
  explicit bit_vector_il(const bit_vector& bv)
    : m_n(bv.size())
    , m_words(bv.data(), bv.data() + bv.num_words())
  {}

  size_t size() const { return m_n; }

  bool operator[](size_t i) const
  {
    return (m_words[i >> 6] >> (i & 63)) & 1ULL;
  }

  const std::vector<uint64_t>& words() const { return m_words; }

private:
  size_t m_n = 0;
  std::vector<uint64_t> m_words;
};

} // namespace sdsl

#endif
