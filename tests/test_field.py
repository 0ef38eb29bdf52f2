"""Field-layer conformance tests (reference: acir_field/src/generic_ark.rs)."""

from acvm_tpu.fields import FieldElement, BN254_FR
from golden_vectors import FIELD_HEX_VECTORS


def test_serialize_fixed_vectors():
    for i, expected_hex in enumerate(FIELD_HEX_VECTORS):
        assert (-FieldElement(i)).to_hex() == expected_hex


def test_max_num_bits():
    assert FieldElement.zero().max_num_bits() == 254
    assert FieldElement.zero().max_num_bytes() == 32


def test_hex_roundtrip():
    f = FieldElement(123456789123456789)
    assert FieldElement.from_hex(f.to_hex()) == f
    assert FieldElement.from_hex("0x" + f.to_hex()) == f
    assert FieldElement.from_hex("zz") is None


def test_and_xor_masking():
    # Reference test: x & x == x for masked widths (generic_ark.rs:411-421).
    for x in range(0, 10000, 371):
        fx = FieldElement(x)
        num_bits = x.bit_length() or 1
        assert fx.and_(fx, num_bits) == fx
        assert fx.xor(fx, num_bits) == FieldElement.zero()
    a, b = FieldElement(0b1100), FieldElement(0b1010)
    assert fieldint(a.and_(b, 4)) == 0b1000
    assert fieldint(a.xor(b, 4)) == 0b0110
    # Masking truncates before the op.
    assert fieldint(FieldElement(0b11100).and_(FieldElement(0b11110), 4)) == 0b1100


def fieldint(f):
    return int(f)


def test_num_bits_and_u128():
    assert FieldElement(0).num_bits() == 0
    assert FieldElement(1).num_bits() == 1
    assert FieldElement(255).num_bits() == 8
    assert FieldElement(256).num_bits() == 9
    big = FieldElement(1 << 130)
    assert not big.fits_in_u128()
    assert big.try_into_u128() is None
    assert FieldElement(77).try_to_u64() == 77
    assert (-FieldElement(1)).try_to_u64() is None


def test_inverse_and_division():
    a = FieldElement(12345)
    assert a * a.inverse() == FieldElement.one()
    assert FieldElement.zero().inverse() == FieldElement.zero()
    assert (a / a) == FieldElement.one()
    assert a.try_inverse() is not None
    assert FieldElement.zero().try_inverse() is None


def test_pow():
    a = FieldElement(3)
    assert a.pow(FieldElement(5)) == FieldElement(243)
    # Fermat: a^(p-1) == 1
    p = BN254_FR.modulus
    assert a.pow(FieldElement(p - 1)) == FieldElement.one()


def test_fetch_nearest_bytes():
    # 8 bits of 0x61 -> [0x61]; 32 bits of 0x61626364 -> LE bytes.
    f = FieldElement(0x61)
    assert f.fetch_nearest_bytes(8) == b"\x61"
    g = FieldElement(0x61626364)
    assert g.fetch_nearest_bytes(32) == bytes([0x64, 0x63, 0x62, 0x61])
    # Rounds up to whole bytes.
    assert g.fetch_nearest_bytes(30) == bytes([0x64, 0x63, 0x62, 0x61])


def test_bits_msb_first():
    f = FieldElement(5)
    bits = f.bits()
    assert len(bits) == 256
    assert bits[-3:] == [True, False, True]
    assert not any(bits[:-3])


def test_negative_wraparound():
    p = BN254_FR.modulus
    assert int(-FieldElement(1)) == p - 1
    assert FieldElement(p) == FieldElement.zero()
    assert FieldElement(-5) == FieldElement(p - 5)
