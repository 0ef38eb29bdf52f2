"""Expression algebra tests mirroring the reference inline tests
(acir/src/native_types/expression/{mod.rs:366-398, operators.rs:232-290})."""

from acvm_tpu.acir import Expression, Witness
from acvm_tpu.fields import FieldElement

fe = FieldElement
one = FieldElement.one


def test_add_mul_smoketest():
    a = Expression(mul_terms=[(fe(2), Witness(1), Witness(2))])
    k = fe(10)
    b = Expression(
        mul_terms=[
            (fe(3), Witness(0), Witness(2)),
            (fe(3), Witness(1), Witness(2)),
            (fe(4), Witness(4), Witness(5)),
        ],
        linear_combinations=[(fe(4), Witness(4))],
        q_c=one(),
    )
    result = a.add_mul(k, b)
    assert result == Expression(
        mul_terms=[
            (fe(30), Witness(0), Witness(2)),
            (fe(32), Witness(1), Witness(2)),
            (fe(40), Witness(4), Witness(5)),
        ],
        linear_combinations=[(fe(40), Witness(4))],
        q_c=fe(10),
    )


def test_add_smoketest():
    a = Expression(
        linear_combinations=[(fe(2), Witness(2))], q_c=fe(2)
    )
    b = Expression(
        linear_combinations=[(fe(4), Witness(4))], q_c=one()
    )
    expected = Expression(
        linear_combinations=[(fe(2), Witness(2)), (fe(4), Witness(4))],
        q_c=fe(3),
    )
    assert a + b == expected
    assert b + a == expected  # commutative


def test_mul_smoketest():
    a = Expression(linear_combinations=[(fe(2), Witness(2))], q_c=fe(2))
    b = Expression(linear_combinations=[(fe(4), Witness(4))], q_c=one())
    expected = Expression(
        mul_terms=[(fe(8), Witness(2), Witness(4))],
        linear_combinations=[(fe(2), Witness(2)), (fe(8), Witness(4))],
        q_c=fe(2),
    )
    assert a.mul(b) == expected
    assert b.mul(a) == expected


def test_mul_degree2_returns_none():
    quad = Expression(mul_terms=[(one(), Witness(1), Witness(2))])
    lin = Expression(linear_combinations=[(one(), Witness(3))])
    assert quad.mul(lin) is None
    assert lin.mul(quad) is None
    # constant * degree-2 is fine
    const = Expression.from_field(fe(5))
    assert const.mul(quad) == quad.scale(fe(5))


def test_predicates_and_witness_view():
    w = Witness(7)
    e = Expression.from_witness(w)
    assert e.to_witness() == w
    assert e.is_degree_one_univariate()
    scaled = e.scale(fe(2))
    assert scaled.to_witness() is None
    assert Expression.from_field(fe(3)).to_const() == fe(3)
    assert Expression.from_witness(w).to_const() is None
    assert Expression.one().is_const()
    assert Expression.zero().is_zero()


def test_fits_in_one_identity():
    w = [Witness(i) for i in range(6)]
    # Axy + Dz fits at width 3 (mul term + 1 extra linear term <= width-2)
    e = Expression(
        mul_terms=[(one(), w[0], w[1])],
        linear_combinations=[(one(), w[2])],
    )
    assert e.fits_in_one_identity(3)
    # Axy + Bx + Cy fits (linear terms match the mul witnesses)
    e = Expression(
        mul_terms=[(one(), w[0], w[1])],
        linear_combinations=[(one(), w[0]), (one(), w[1]), (one(), w[2])],
    )
    assert e.fits_in_one_identity(3)
    # Axy + Bx + Cz does not (z unmatched, fan-in exceeds width-2)
    e = Expression(
        mul_terms=[(one(), w[0], w[1])],
        linear_combinations=[(one(), w[0]), (one(), w[2]), (one(), w[3])],
    )
    assert not e.fits_in_one_identity(3)
    # two mul terms never fit
    e = Expression(
        mul_terms=[(one(), w[0], w[1]), (one(), w[2], w[3])],
    )
    assert not e.fits_in_one_identity(3)


def test_sort_canonicalizes():
    e = Expression(
        mul_terms=[
            (one(), Witness(3), Witness(4)),
            (one(), Witness(1), Witness(2)),
        ],
        linear_combinations=[(one(), Witness(9)), (one(), Witness(1))],
    )
    e.sort()
    assert [t[1:] for t in e.mul_terms] == [
        (Witness(1), Witness(2)),
        (Witness(3), Witness(4)),
    ]
    assert [t[1] for t in e.linear_combinations] == [Witness(1), Witness(9)]


def test_witness_add_operator():
    from acvm_tpu.acir import Witness

    e = Expression.from_witness(Witness(1)) + Witness(2)
    assert e.linear_combinations == [
        (one(), Witness(1)),
        (one(), Witness(2)),
    ]
