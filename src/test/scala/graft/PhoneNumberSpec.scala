package graft

import graft.functions.PhoneNumber
import graft.functions.PhoneNumber._
import org.scalatest.funsuite.AnyFunSuite

/** Phone-number parse pipeline (ref
  * `plugins/phonenumber/lib_phonenumber.ecllib:23-66`): hand-pinned
  * expectations per documented libphonenumber behavior — the regression
  * vectors the q175 gate then replays distributed.
  */
class PhoneNumberSpec extends AnyFunSuite {

  private def p(n: String, r: String) = PhoneNumber.parse(n, r)

  test("E.164 formatting and validity across input spellings") {
    for (s <- Seq("+1 650-253-0000", "(650) 253-0000", "650.253.0000",
        "011 1 650 253 0000")) {
      val r = p(s, "US")
      assert(r.valid && r.number == "+16502530000", s"input: $s -> $r")
      assert(r.countryCode == 1 && r.regionCode == "US")
      assert(r.lineType == FIXED_LINE_OR_MOBILE)
      assert(r.error == NO_PARSING_ERROR)
    }
  }

  test("NANP region split: Canadian area codes resolve to CA") {
    val ca = p("+1 416 555 0199", "US")
    assert(ca.valid && ca.regionCode == "CA" && ca.countryCode == 1)
    assert(p("+1 212 555 0199", "GB").regionCode == "US")
  }

  test("line types: toll-free, premium, mobile, fixed, voip, pager") {
    assert(p("1-800-234-5678", "US").lineType == TOLL_FREE)
    assert(p("1-900-234-5678", "US").lineType == PREMIUM_RATE)
    assert(p("07700 900123", "GB").lineType == MOBILE)
    assert(p("020 7946 0958", "GB").lineType == FIXED_LINE)
    assert(p("0808 157 0192", "GB").lineType == TOLL_FREE)
    assert(p("06 12 34 56 78", "FR").lineType == MOBILE)
    assert(p("09 87 65 43 21", "FR").lineType == VOIP)
    assert(p("+33 1 42 68 53 00", "US").lineType == FIXED_LINE)
    assert(p("0412 345 678", "AU").lineType == MOBILE)
    assert(p("1800 123 456", "AU").lineType == TOLL_FREE)
    assert(p("+91 98765 43210", "US").lineType == MOBILE)
    assert(p("+49 1512 3456789", "DE").lineType == MOBILE)
  }

  test("trunk-prefix handling: national 0 dropped, Italy keeps it") {
    // GB national dialing drops the trunk 0 in the NSN
    assert(p("020 7946 0958", "GB").number == "+442079460958")
    // Italy's NSN legitimately starts with 0 (no trunk drop)
    val it = p("06 699 0110", "IT")
    assert(it.valid && it.number == "+39066990110" &&
      it.lineType == FIXED_LINE)
    val itMob = p("347 123 4567", "IT")
    assert(itMob.valid && itMob.lineType == MOBILE)
  }

  test("IDD resolution per region: 00 / 011 / 0011 / 010") {
    assert(p("00 44 20 7946 0958", "DE").number == "+442079460958")
    assert(p("011 44 20 7946 0958", "US").number == "+442079460958")
    assert(p("0011 44 20 7946 0958", "AU").number == "+442079460958")
    assert(p("010 44 20 7946 0958", "JP").number == "+442079460958")
  }

  test("errors mirror phonenumber_error semantics") {
    assert(p("not a phone", "US").error == NOT_A_NUMBER)
    assert(p("", "US").error == NOT_A_NUMBER)
    assert(p("+999 123456789", "US").error == INVALID_COUNTRY_CODE_ERROR)
    assert(p("123456", "ZZ").error == INVALID_COUNTRY_CODE_ERROR)
    assert(p("00 1", "GB").error == TOO_SHORT_AFTER_IDD)
    assert(p("+44 12", "GB").error == TOO_SHORT_NSN)
    assert(p("+44 123456789012345678", "GB").error == TOO_LONG_NSN)
    // parseable but failing every rule: no parse error, just invalid
    val odd = p("+44 4412345678", "GB")
    assert(odd.error == NO_PARSING_ERROR && !odd.valid &&
      odd.lineType == UNKNOWN)
  }

  test("invalid results carry empty region and raw NSN, valid carry E.164") {
    val bad = p("+44 9912", "GB")
    assert(!bad.valid && bad.regionCode == "" && bad.countryCode == 44)
    val good = p("+55 11 91234 5678", "US")
    assert(good.valid && good.regionCode == "BR" &&
      good.number == "+5511912345678" && good.lineType == MOBILE)
  }
}
